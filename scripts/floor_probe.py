"""Accuracy error-budget probe (VERDICT r3 next #2, second half).

The float-depth fixture A/B refuted the uint16-quantization attribution
of the ~0.017 cm ATE floor (runs/tpu_session_r4c: f32 depth 0.01695 vs
uint16 0.01748 — a 3% effect). This probe tests the next candidate:
RENDERED-VS-RENDERED REPRESENTATION MISMATCH — the product target depth
is the SRC point cloud re-rendered as splats from the tar pose
(reference trick, src/data/dataset.py:361-372), whose sub-pixel
sampling pattern the TAR-scene render can never exactly reproduce, so
the loss at the true pose is nonzero and the basin floor is noise.

Per pair (product config, real fixture data, full 1200x680 scale):
  A (product): optimize against data.src_depth (src-cloud re-render).
  B (same-scene): optimize against the TAR scene itself rendered at the
    GT src pose — zero representation mismatch by construction; the
    only remaining error sources are optimizer dynamics, staleness
    gates and f32 accumulation.
  Also logs loss at the GT pose under both targets (the basin floor).

If eT_B collapses (~<=0.002 cm) while eT_A stays ~0.01+: the floor is
the representation mismatch class, same as the reference's own
protocol — documented, chase closed. If eT_B does NOT collapse: the
optimizer/gates leave accuracy on the table — keep chasing.

Usage: python scripts/floor_probe.py [n_pairs] [out_json] [room] [root]
(room/root default room0 / datasets/Replica_fixture; round 5 runs it on
the dense0 conditioning fixture too — VERDICT r4 next #4.)
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from gsplatloc_tpu.data.parser import Parser
from gsplatloc_tpu.eval.metrics import rotation_error_deg, translation_error
from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
from gsplatloc_tpu.ops.fused_subtile import (
    build_subtile_slot_buffer, render_tracking_depth_subtile,
)
from gsplatloc_tpu.ops.lie import invert_se3
from gsplatloc_tpu.opt.tracking import TrackingConfig, optimize_pose


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    out_path = sys.argv[2] if len(sys.argv) > 2 else "runs/floor_probe.json"
    room = sys.argv[3] if len(sys.argv) > 3 else "room0"
    root = sys.argv[4] if len(sys.argv) > 4 else "datasets/Replica_fixture"

    parser = Parser(data_set="Replica", name=room, normalize=True,
                    backend="subtile", knn_method="exact",
                    root=root)
    cfg = TrackingConfig()  # the product default (kcover=16, coast, gates)
    rows = []
    for i in range(n_pairs):
        data = parser[i]
        h, w = data.src_depth.shape
        scene = scene_from_point_cloud(
            data.tar_points, data.colors, grid_shape=(h, w),
            knn_sq_dists=parser.knn_for_frame(i), knn_method="exact")
        vm_gt = invert_se3(data.src_c2w)
        slot_gt, meta_gt, _ = build_subtile_slot_buffer(
            scene, vm_gt, parser.K, w, h, cfg.near_plane, cfg.far_plane)
        depth_b, _ = render_tracking_depth_subtile(
            vm_gt, parser.K, w, h, slot_gt, meta_gt)
        depth_b = jax.lax.stop_gradient(depth_b)

        row = {"pair": i}
        for tag, target in (("A_product", data.src_depth),
                            ("B_same_scene", depth_b)):
            res = optimize_pose(scene, data.tar_c2w, target, parser.K,
                                w, h, config=cfg, backend="fused")
            best = np.asarray(res.best_pose.to_c2w())
            gt = np.asarray(data.src_c2w)
            row[tag] = {
                "eT_cm": float(translation_error(best, gt)) * 100,
                "eR_deg": float(rotation_error_deg(best, gt)),
                "best_loss": float(res.best_loss),
                "steps": int(res.steps_run),
            }
            # the basin floor: loss at the exact GT pose for this target
            from gsplatloc_tpu.losses import tracking_loss

            slot_i, meta_i, _ = build_subtile_slot_buffer(
                scene, vm_gt, parser.K, w, h, cfg.near_plane,
                cfg.far_plane)
            d_gt_pose, _ = render_tracking_depth_subtile(
                vm_gt, parser.K, w, h, slot_i, meta_i)
            tl = tracking_loss(d_gt_pose, target, cfg.depth_lambda,
                               cfg.normal_lambda)
            row[tag]["loss_at_gt"] = float(tl.total)
        rows.append(row)
        print(json.dumps(row), flush=True)

    eTa = [r["A_product"]["eT_cm"] for r in rows]
    eTb = [r["B_same_scene"]["eT_cm"] for r in rows]
    summary = {
        "pairs": n_pairs,
        "eT_A_product_rms_cm": float(np.sqrt(np.mean(np.square(eTa)))),
        "eT_B_same_scene_rms_cm": float(np.sqrt(np.mean(np.square(eTb)))),
        "rows": rows,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"[floor_probe] A(product) eT RMS {summary['eT_A_product_rms_cm']:.5f} cm"
          f" vs B(same-scene) {summary['eT_B_same_scene_rms_cm']:.5f} cm"
          f" -> {out_path}", flush=True)


if __name__ == "__main__":
    main()
