"""Quantify the grid-window kNN scale-init approximation vs the exact
native KdTree (VERDICT r1 #4).

Scale init drives ATE (SURVEY.md hard part 4; reference
src/my_gsplat/geometry.py:44-66 uses small_gicp's exact KdTree at ~816k
points). Our hot path (ops/knn.py grid_knn_sq_dists, window=2 -> 24
candidates) assumes a point's 3D nearest neighbors lie in a small pixel
window — true on smooth surfaces, violated across depth discontinuities.

Phase 1 (host, fast): at the full 816k-point cluttered bench scene, compute
scales via grid-window and via the exact C++ KdTree; report the rel-diff
distribution and where the diffs live (depth-edge pixels).
Phase 2 (device): run the single-pair pose recovery with each scale init
and report end-of-pair eT/eR. Run on the TPU for the headline scale;
--small runs a 240x320 recovery anywhere.

Usage: python scripts/knn_accuracy.py [--small] [--clutter N] [--cpu]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="240x320 recovery (CPU-friendly)")
    ap.add_argument("--clutter", type=int, default=60)
    ap.add_argument("--skip-recovery", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend in-process (the site TPU "
                         "plugin overrides JAX_PLATFORMS env)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    from gsplatloc_tpu.data.synthetic import box_room_frame
    from gsplatloc_tpu.eval.metrics import (
        rotation_error_deg, translation_error,
    )
    from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
    from gsplatloc_tpu.ops import camera
    from gsplatloc_tpu.ops.knn import (
        exact_knn_sq_dists, grid_knn_sq_dists, init_gs_scales_from_sq_dists,
    )
    from gsplatloc_tpu.ops.lie import invert_se3
    from gsplatloc_tpu.opt.tracking import TrackingConfig, optimize_pose

    if args.small:
        H, W = 240, 320
    else:
        H, W = 680, 1200
    K_np = np.array([[0.5 * W, 0, W / 2 - 0.5], [0, 0.5 * W, H / 2 - 0.5],
                     [0, 0, 1]], np.float32)
    rgb, depth = box_room_frame(np.eye(4), K_np, H, W, clutter=args.clutter)
    K = jnp.asarray(K_np)
    pts = camera.depth_to_points(jnp.asarray(depth), K)
    pts_np = np.asarray(pts)

    # Phase 1: scale diffs at full scale
    t0 = time.time()
    d2_grid = np.asarray(grid_knn_sq_dists(pts.reshape(H, W, 3), 5, 2))
    t_grid = time.time() - t0
    t0 = time.time()
    d2_exact = np.asarray(exact_knn_sq_dists(pts_np, 5))
    t_exact = time.time() - t0
    s_grid = np.asarray(init_gs_scales_from_sq_dists(jnp.asarray(d2_grid)))[:, 0]
    s_exact = np.asarray(init_gs_scales_from_sq_dists(jnp.asarray(d2_exact)))[:, 0]
    rel = np.abs(s_grid - s_exact) / np.maximum(s_exact, 1e-12)
    # grid kNN >= exact kNN always (candidate set is a subset), so rel is
    # one-sided overestimation
    print(f"N={H*W}  clutter={args.clutter}  "
          f"grid {t_grid*1e3:.0f} ms  exact-kdtree {t_exact*1e3:.0f} ms")
    print(f"scale rel-diff: mean {rel.mean():.3e}  p99 "
          f"{np.percentile(rel, 99):.3e}  p99.9 "
          f"{np.percentile(rel, 99.9):.3e}  max {rel.max():.3e}")
    print(f"frac > 1% {np.mean(rel > 0.01):.4f}  "
          f"frac > 10% {np.mean(rel > 0.10):.5f}  "
          f"frac > 2x {np.mean(rel > 1.0):.6f}")

    if args.skip_recovery:
        return

    # Phase 2: end-of-pair pose recovery with each init
    gt = np.eye(4, dtype=np.float32)
    gt[:3, :3] = Rotation.from_euler(
        "xyz", [0.4, -0.3, 0.2], degrees=True).as_matrix()
    gt[:3, 3] = [0.01, -0.008, 0.012]
    gt = jnp.asarray(gt)
    cfg = TrackingConfig(max_steps=300, patience=60, warmup_steps=40)

    for name, d2 in (("grid", d2_grid), ("exact", d2_exact)):
        scene = scene_from_point_cloud(
            pts, jnp.asarray(rgb.reshape(-1, 3)),
            knn_sq_dists=jnp.asarray(d2), grid_shape=(H, W),
        )
        jax.block_until_ready(scene)
        from gsplatloc_tpu.ops.fused_tracking import (
            build_slot_buffer, render_tracking_depth,
        )

        vm_gt = invert_se3(gt)
        slot, meta, _ = build_slot_buffer(scene, vm_gt, K, W, H, 1e-2, 1e10)
        depth_gt, _ = render_tracking_depth(vm_gt, K, W, H, slot, meta)
        depth_gt = jax.lax.stop_gradient(depth_gt)
        res = optimize_pose(scene, jnp.eye(4), depth_gt, K, W, H,
                            config=cfg, backend="fused")
        best = res.best_pose.to_c2w()
        eT = float(translation_error(best, gt)) * 100
        eR = float(rotation_error_deg(best, gt))
        print(f"recovery [{name:5s}]: eT {eT:.5f} cm  eR {eR:.5f} deg  "
              f"best_loss {float(res.best_loss):.3e}  "
              f"steps {int(res.steps_run)}")


if __name__ == "__main__":
    main()
