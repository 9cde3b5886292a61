"""Multi-chip scaling measurement on the virtual CPU device mesh
(VERDICT r1 #5: efficiency numbers, not just a correctness dryrun).

Launches one subprocess per mesh size D in {1, 2, 4, 8} with
XLA_FLAGS=--xla_force_host_platform_device_count=D, runs the fused tracking
optimizer over a ("tiles",) mesh (parallel/sharded.py: tile rows sharded,
pose grads psum'd through the replication transpose), and reports steps/s
and parallel efficiency vs D=1. CPU virtual devices are host threads, so
ABSOLUTE numbers are meaningless (kernels run in interpret mode) but the
RELATIVE efficiency exposes sharding overheads (replicated binning, psum
latency, tile-band imbalance) the real-pod run would see.

Usage: python scripts/perf_scaling.py            # the driver
       python scripts/perf_scaling.py --child D  # internal
"""

import argparse
import json
import os
import subprocess
import sys
import time


def child(d: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= d, (len(jax.devices()), d)
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
    from gsplatloc_tpu.parallel.sharded import make_tile_mesh

    H, W = 128, 256
    K_np = np.array([[0.5 * W, 0, W / 2 - 0.5], [0, 0.5 * W, H / 2 - 0.5],
                     [0, 0, 1]], np.float32)
    rgb, depth = box_room_frame(np.eye(4), K_np, H, W, clutter=20)
    K = jnp.asarray(K_np)
    pts = camera.depth_to_points(jnp.asarray(depth), K)
    scene = scene_from_point_cloud(pts, jnp.asarray(rgb.reshape(-1, 3)),
                                   grid_shape=(H, W))
    vm0 = invert_se3(jnp.eye(4))
    slot, meta, _ = build_slot_buffer(scene, vm0, K, W, H, 1e-2, 1e10)
    depth_gt, _ = render_tracking_depth(vm0, K, W, H, slot, meta)
    depth_gt = jax.lax.stop_gradient(depth_gt)

    mesh = make_tile_mesh(d)
    n_steps = 24
    cfg = TrackingConfig(max_steps=n_steps, patience=10_000, warmup_steps=5,
                         early_stop=False, resort_every=8)
    run = lambda: optimize_pose(scene, jnp.eye(4), depth_gt, K, W, H,  # noqa: E731
                                config=cfg, backend="fused", mesh=mesh)
    float(run().best_loss)  # compile + warm
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        float(run().best_loss)
    dt = (time.time() - t0) / reps
    print(json.dumps({"d": d, "steps_per_s": n_steps / dt,
                      "ms_per_step": dt / n_steps * 1e3}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--sizes", type=int, nargs="*", default=[1, 2, 4, 8])
    args = ap.parse_args()
    if args.child is not None:
        child(args.child)
        return

    rows = []
    for d in args.sizes:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + f" --xla_force_host_platform_device_count={d}")
        env["JAX_PLATFORMS"] = "cpu"
        out = subprocess.run(
            [sys.executable, __file__, "--child", str(d)],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"D={d} FAILED:\n{out.stdout}\n{out.stderr[-2000:]}")
            continue
        rows.append(json.loads(line[-1]))
        print(f"D={d}: {rows[-1]['steps_per_s']:.2f} steps/s "
              f"({rows[-1]['ms_per_step']:.1f} ms/step)", flush=True)
    if rows and rows[0]["d"] == 1:
        base = rows[0]["steps_per_s"]
        print("\n| D | steps/s | speedup | efficiency |")
        print("|---|---|---|---|")
        for r in rows:
            sp = r["steps_per_s"] / base
            print(f"| {r['d']} | {r['steps_per_s']:.2f} | {sp:.2f}x | "
                  f"{sp / r['d'] * 100:.0f}% |")


if __name__ == "__main__":
    main()
