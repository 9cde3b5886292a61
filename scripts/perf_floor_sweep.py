"""Sweep the K-cover STEP-kernel block width (GSPLATLOC_KCOVER_CB) on
the fire-free in-loop floor (3.43 ms at the round-5 default 1024).

The floor = fwd kernel 0.70 + bwd 1.94 + ~0.8 loss/Adam/loop; the bwd
kernel sits ~3x over its ~0.6 ms VPU speed-of-light, and CB_STEP sets
its block shape (double-buffered (5, K, CB) kbuf stream + (8, CB)
cotangent blocks). Each config runs the REAL jitted 300-step loop with
both fire gates pinned open (the floor row of perf_fire_inloop) in a
subprocess (the knob is read at import).

Usage: python scripts/perf_floor_sweep.py [reps]
"""

import os
import subprocess
import sys
import time

CONFIGS = [512, 1024, 2048, 4096]


def measure() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gsplatloc_tpu.data.synthetic import box_room_frame
    from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
    from gsplatloc_tpu.ops import camera
    from gsplatloc_tpu.ops.fused_tracking import (
        build_slot_buffer, render_tracking_depth,
    )
    from gsplatloc_tpu.ops.lie import invert_se3
    from gsplatloc_tpu.opt.tracking import TrackingConfig, optimize_pose

    H, W = 680, 1200
    K_np = np.array([[600.0, 0, 599.5], [0, 600.0, 339.5], [0, 0, 1]],
                    np.float32)
    rgb, depth = box_room_frame(np.eye(4), K_np, H, W)
    K = jnp.asarray(K_np)
    pts = camera.depth_to_points(jnp.asarray(depth), K)
    scene = scene_from_point_cloud(pts, jnp.asarray(rgb.reshape(-1, 3)),
                                   grid_shape=(H, W))
    jax.block_until_ready(scene)
    vm0 = invert_se3(jnp.eye(4))
    slot, meta, _ = build_slot_buffer(scene, vm0, K, W, H, 1e-2, 1e10)
    depth_gt = jax.lax.stop_gradient(
        render_tracking_depth(vm0, K, W, H, slot, meta)[0])
    cfg = TrackingConfig(
        max_steps=300, patience=10_000, warmup_steps=100, early_stop=False,
        resort_every=10, subtile=True, kcover=16,
        resort_motion_px=1e9, select_motion_px=1e9, coast_after_steps=0,
    )
    res = optimize_pose(scene, jnp.eye(4), depth_gt, K, W, H,
                        config=cfg, backend="fused")
    float(res.best_loss)  # compile + warm
    t0 = time.time()
    res = optimize_pose(scene, jnp.eye(4), depth_gt, K, W, H,
                        config=cfg, backend="fused")
    float(res.best_loss)
    return (time.time() - t0) / int(res.steps_run) * 1e3


def main():
    if os.environ.get("_FLOOR_SWEEP_CHILD") == "1":
        print(f"RESULT {measure():.3f}", flush=True)
        return
    for cb in CONFIGS:
        env = dict(os.environ, _FLOOR_SWEEP_CHILD="1",
                   GSPLATLOC_KCOVER_CB=str(cb))
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, timeout=3000)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("RESULT")]
        if not line:
            print(f"CB_STEP={cb} FAILED:\n{out.stdout[-1200:]}\n"
                  f"{out.stderr[-1200:]}", flush=True)
            continue
        print(f"[floor_sweep] CB_STEP={cb:5d}: {float(line[0].split()[1]):.3f}"
              f" ms/step fire-free floor", flush=True)


if __name__ == "__main__":
    main()
