"""Consolidated honest TPU performance measurement (component + end-to-end).

Every number forces a per-call host value read: on the axon relay,
block_until_ready returns before remote execution finishes and each dispatch
carries ~29 ms fixed overhead — the jitted while_loop tracking path amortizes
that overhead away, the per-call component numbers include it (noted).

Usage: JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/perf_tpu.py [N H W]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gsplatloc_tpu.data.synthetic import box_room_frame
from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
from gsplatloc_tpu.models.pose import PoseState
from gsplatloc_tpu.ops import camera
from gsplatloc_tpu.ops.lie import invert_se3
from gsplatloc_tpu.ops.rasterize import rasterize
from gsplatloc_tpu.losses import tracking_loss
from gsplatloc_tpu.opt.tracking import TrackingConfig, optimize_pose


def main():
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 680
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 1200
    K_np = np.array([[0.5 * W, 0, W / 2 - 0.5], [0, 0.5 * W, H / 2 - 0.5],
                     [0, 0, 1]], np.float32)
    rgb, depth = box_room_frame(np.eye(4), K_np, H, W)
    K = jnp.asarray(K_np)
    pts = camera.depth_to_points(jnp.asarray(depth), K)
    scene = scene_from_point_cloud(pts, jnp.asarray(rgb.reshape(-1, 3)),
                                   grid_shape=(H, W))
    jax.block_until_ready(scene)
    n = pts.shape[0]
    out = {"n_gaussians": n, "width": W, "height": H}

    @jax.jit
    def fwd(vm):
        r, _ = rasterize(scene.means, scene.quats, scene.scales,
                         scene.opacities, scene.sh_coeffs, vm, K, W, H,
                         sh_degree=1, render_mode="RGB+ED", backend="pallas")
        return r

    depth_gt = jax.lax.stop_gradient(fwd(jnp.eye(4))[..., 3])

    def timed(f, args_list, warm=1):
        for a in args_list[:warm]:
            float(jnp.sum(jax.tree.leaves(f(*a))[0]))
        ts = []
        for a in args_list[warm:]:
            t0 = time.time()
            float(jnp.sum(jax.tree.leaves(f(*a))[0]))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    from scipy.spatial.transform import Rotation

    vms = []
    for i in range(7):
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = Rotation.from_euler("x", 0.01 * i).as_matrix()
        vms.append((jnp.asarray(np.linalg.inv(c2w)),))
    out["fwd_ms_per_call"] = timed(fwd, vms) * 1e3

    @jax.jit
    def step(q):
        def f(qq, tt):
            vm = invert_se3(PoseState(quat=qq, trans=tt).to_c2w())
            r, _ = rasterize(scene.means, scene.quats, scene.scales,
                             scene.opacities, scene.sh_coeffs, vm, K, W, H,
                             sh_degree=1, render_mode="RGB+ED",
                             backend="pallas")
            return tracking_loss(r[..., 3], depth_gt).total
        return jax.value_and_grad(f, argnums=(0, 1))(q, jnp.zeros(3))

    qs = [(jnp.array([1.0, 1e-4 * i, 0.0, 0.0]),) for i in range(7)]
    out["fwd_bwd_ms_per_call"] = timed(step, qs) * 1e3

    # end-to-end: the jitted while_loop pose optimization (dispatch amortized)
    cfg = TrackingConfig(max_steps=100, patience=1000, warmup_steps=100,
                         early_stop=False)
    res = optimize_pose(scene, jnp.eye(4), depth_gt, K, W, H, config=cfg,
                        backend="pallas")
    float(res.best_loss)  # compile+run once
    t0 = time.time()
    res = optimize_pose(scene, jnp.eye(4) * 1.0, depth_gt, K, W, H,
                        config=cfg, backend="pallas")
    steps = int(res.steps_run)
    dt = time.time() - t0
    out["loop_steps"] = steps
    out["loop_ms_per_step"] = dt / steps * 1e3
    out["pose_steps_per_sec"] = steps / dt
    out["fwd_bwd_mpix_per_sec"] = H * W / (dt / steps) / 1e6
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
