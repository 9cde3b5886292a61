"""Diagnose one fixture pair end-to-end: parser output stats, loss at
the init (tar GT) and true (src GT) poses, and the optimizer's result —
for hunting per-pair divergences like office2 pair 12 (suite r4c:
eT 42.7 cm, best_loss 0.33 from a 1.6 mm init while neighbors track at
0.0003 cm / loss 0.004).

Usage: python scripts/inspect_pair.py <room> <pair> [data_root]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from gsplatloc_tpu.data.parser import Parser
from gsplatloc_tpu.eval.metrics import rotation_error_deg, translation_error
from gsplatloc_tpu.losses import tracking_loss
from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
from gsplatloc_tpu.ops.fused_subtile import (
    build_subtile_slot_buffer, render_tracking_depth_subtile,
)
from gsplatloc_tpu.ops.lie import invert_se3
from gsplatloc_tpu.opt.tracking import TrackingConfig, optimize_pose


def stats(name, a):
    a = np.asarray(a)
    print(f"  {name}: shape {a.shape} min {a.min():.4f} max {a.max():.4f} "
          f"mean {a.mean():.4f} zeros {(a == 0).sum()} "
          f"nonfinite {(~np.isfinite(a)).sum()}")


def main():
    room = sys.argv[1] if len(sys.argv) > 1 else "office2"
    pair = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    root = sys.argv[3] if len(sys.argv) > 3 else "datasets/Replica_fixture"

    parser = Parser(data_set="Replica", name=room, normalize=True,
                    backend="subtile", knn_method="exact", root=root)
    cfg = TrackingConfig()
    data = parser[pair]
    h, w = data.src_depth.shape
    print(f"{room} pair {pair} ({w}x{h}):")
    stats("src_depth (re-rendered target)", data.src_depth)
    stats("tar_points z", np.asarray(data.tar_points)[:, 2])
    print(f"  pca_factor {float(data.pca_factor):.5f}")

    knn = parser.knn_for_frame(pair)
    scene = scene_from_point_cloud(
        data.tar_points, data.colors, grid_shape=(h, w),
        knn_sq_dists=knn, knn_method="exact")
    stats("scene scales", scene.scales)

    for tag, pose in (("init (tar GT)", data.tar_c2w),
                      ("true (src GT)", data.src_c2w)):
        vm = invert_se3(pose)
        slot, meta, _ = build_subtile_slot_buffer(
            scene, vm, parser.K, w, h, cfg.near_plane, cfg.far_plane)
        d, a = render_tracking_depth_subtile(vm, parser.K, w, h, slot, meta)
        tl = tracking_loss(d, data.src_depth, cfg.depth_lambda,
                           cfg.normal_lambda)
        print(f"  loss at {tag}: total {float(tl.total):.6f} "
              f"depth {float(tl.depth):.6f} sil {float(tl.silhouette):.6f}"
              f"  render alpha mean {float(jnp.mean(a)):.4f}")

    res = optimize_pose(scene, data.tar_c2w, data.src_depth, parser.K,
                        w, h, config=cfg, backend="fused")
    best = np.asarray(res.best_pose.to_c2w())
    gt = np.asarray(data.src_c2w)
    print(f"  optimize: eT {float(translation_error(best, gt))*100:.5f} cm"
          f"  eR {float(rotation_error_deg(best, gt)):.5f} deg"
          f"  best_loss {float(res.best_loss):.6f}"
          f"  steps {int(res.steps_run)} rebuilds {int(res.rebuilds)}"
          f"  selects {int(res.selects)}")


if __name__ == "__main__":
    main()
