"""Headline-scale recovery accuracy + wall time for the K-cover path.

The staleness question the small CPU scenes cannot answer (fx=64 means
sub-pixel TOTAL motion): at 1200x680 / fx=600 / 816k splats, an Adam step
near the floor bounds to ~1-2 px of screen motion, so the selection gate
fires constantly at 0.25 px. This measures what that costs and what a
looser gate gives up: recovery eT/eR from a realistic inter-frame offset
(~2 cm / 0.8 deg), per config, plus honest per-pair wall time.

Run: python scripts/tpu_kcover_recovery.py  (ONE TPU process at a time).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from gsplatloc_tpu.data.synthetic import box_room_frame
from gsplatloc_tpu.eval.metrics import rotation_error_deg, translation_error
from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
from gsplatloc_tpu.ops import camera
from gsplatloc_tpu.ops.fused_subtile import (
    build_subtile_slot_buffer, render_tracking_depth_subtile,
)
from gsplatloc_tpu.ops.lie import invert_se3
from gsplatloc_tpu.opt.tracking import TrackingConfig, optimize_pose


def main():
    H, W = 680, 1200
    K_np = np.array([[600.0, 0, 599.5], [0, 600.0, 339.5], [0, 0, 1]],
                    np.float32)
    rgb, depth = box_room_frame(np.eye(4), K_np, H, W, clutter=40)
    K = jnp.asarray(K_np)
    pts = camera.depth_to_points(jnp.asarray(depth), K)
    scene = scene_from_point_cloud(pts, jnp.asarray(rgb.reshape(-1, 3)),
                                   grid_shape=(H, W))
    jax.block_until_ready(scene)

    # GT = a realistic inter-frame pose; init = identity (the tar pose),
    # i.e. the reference protocol's starting offset
    gt = np.eye(4, dtype=np.float32)
    gt[:3, :3] = Rotation.from_euler(
        "xyz", [0.5, -0.3, 0.2], degrees=True).as_matrix()
    gt[:3, 3] = [0.012, -0.008, 0.015]
    gt = jnp.asarray(gt)
    slot, meta, _ = build_subtile_slot_buffer(
        scene, invert_se3(gt), K, W, H, 1e-2, 1e10)
    depth_gt, _ = render_tracking_depth_subtile(
        invert_se3(gt), K, W, H, slot, meta)
    depth_gt = jax.lax.stop_gradient(depth_gt)
    eT0 = float(translation_error(jnp.eye(4), gt)) * 100
    eR0 = float(rotation_error_deg(jnp.eye(4), gt))
    print(f"init offset: eT {eT0:.3f} cm eR {eR0:.3f} deg", flush=True)

    configs = [("subtile", dict(kcover=0))]
    for gate in (0.25, 2.0):  # tight vs default (each config = a compile)
        configs.append((f"kcover16 gate={gate}",
                        dict(kcover=16, select_motion_px=gate)))
    # gate DECOUPLING (round 3): a rebuild costs ~38 ms on top of the
    # ~18 ms select, but binning/depth-ORDER staleness is far more
    # forgiving than cover staleness (inversions happen between nearly
    # equal depths, whose composite is ~order-invariant) — measure what
    # a looser rebuild gate gives up when the select gate stays at 2 px.
    for rgate in (4.0, 8.0):
        configs.append((f"kcover16 rb_gate={rgate}",
                        dict(kcover=16, select_motion_px=2.0,
                             resort_motion_px=rgate)))

    for name, kw in configs:
        cfg = TrackingConfig(max_steps=300, patience=10_000,
                             warmup_steps=100, early_stop=False,
                             resort_every=10, **kw)
        try:
            res = optimize_pose(scene, jnp.eye(4), depth_gt, K, W, H,
                                config=cfg, backend="fused")
            float(res.best_loss)  # compile + warm
            t0 = time.time()
            res = optimize_pose(scene, jnp.eye(4), depth_gt, K, W, H,
                                config=cfg, backend="fused")
            float(res.best_loss)
            dt = time.time() - t0
            best = res.best_pose.to_c2w()
            print(f"{name:22s} eT[cm] "
                  f"{float(translation_error(best, gt))*100:.5f} eR[deg] "
                  f"{float(rotation_error_deg(best, gt)):.5f} loss "
                  f"{float(res.best_loss):.2e} selects {int(res.selects):3d} "
                  f"rebuilds {int(res.rebuilds):2d} "
                  f"{dt/int(res.steps_run)*1e3:6.2f} ms/step", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
