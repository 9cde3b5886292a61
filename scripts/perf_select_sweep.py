"""Sweep the select-kernel tuning knobs on chip: CB_SEL (walk block
width) x SEL_KGROUP (extraction group width), timing the standalone
product select (build_kcover_buffer — its 282 MB kbuf output is the real
product output, so standalone timing is not relay-confounded the way
small-output probes are; see perf_select_split.py).

Each config re-imports the package in a subprocess (both knobs are read
at import). The winner should then be confirmed with the in-loop
differential fit (perf_fire_inloop.py) before changing defaults.

Usage: python scripts/perf_select_sweep.py [reps]
"""

import os
import subprocess
import sys
import time

CONFIGS = [
    # (CB_SEL, SEL_KGROUP)
    (512, 1),   # round-4 shipping default (per-k extraction)
    (512, 4),
    (512, 8),
    (512, 16),
    (256, 4),
    (256, 8),
    (128, 4),
    (128, 8),
]


def measure(reps: int) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gsplatloc_tpu.data.synthetic import box_room_frame
    from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
    from gsplatloc_tpu.ops import camera
    from gsplatloc_tpu.ops.fused_tracking import cam_vector
    from gsplatloc_tpu.ops.kcover import (
        build_kcover_buffer, build_kcover_slot_buffer,
    )
    from gsplatloc_tpu.ops.lie import invert_se3

    H, W = 680, 1200
    K_np = np.array([[600.0, 0, 599.5], [0, 600.0, 339.5], [0, 0, 1]],
                    np.float32)
    rgb, depth = box_room_frame(np.eye(4), K_np, H, W)
    K = jnp.asarray(K_np)
    pts = camera.depth_to_points(jnp.asarray(depth), K)
    scene = scene_from_point_cloud(pts, jnp.asarray(rgb.reshape(-1, 3)),
                                   grid_shape=(H, W))
    vm = invert_se3(jnp.eye(4))
    slot, meta, _ = build_kcover_slot_buffer(scene, vm, K, W, H, 1e-2,
                                             1e10)
    cam = cam_vector(vm, K, W, H)
    n_ty, n_tx = -(-H // 16), -(-W // 128)

    fn = jax.jit(lambda: build_kcover_buffer(
        slot, meta, cam, n_ty, n_tx, 1e-2, 1e10, k_cover=16))
    kb = fn()
    float(kb[0, 0, 0])  # compile + honest completion
    t0 = time.time()
    for _ in range(reps):
        kb = fn()
        float(kb[0, 0, 0])
    return (time.time() - t0) / reps


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    if os.environ.get("_SEL_SWEEP_CHILD") == "1":
        print(f"RESULT {measure(reps)*1e3:.2f}", flush=True)
        return
    results = []
    for cb, kg in CONFIGS:
        env = dict(os.environ, _SEL_SWEEP_CHILD="1",
                   GSPLATLOC_KCOVER_SEL_CB=str(cb),
                   GSPLATLOC_SEL_KGROUP=str(kg))
        out = subprocess.run(
            [sys.executable, __file__, str(reps)], env=env,
            capture_output=True, text=True, timeout=3000)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("RESULT")]
        if not line:
            print(f"CB={cb} KGROUP={kg} FAILED:\n{out.stdout[-1500:]}\n"
                  f"{out.stderr[-1500:]}", flush=True)
            continue
        ms = float(line[0].split()[1])
        results.append((ms, cb, kg))
        print(f"[select_sweep] CB_SEL={cb:4d} KGROUP={kg:2d}: {ms:7.2f} "
              f"ms/select (incl. dispatch, {reps} reps)", flush=True)
    if results:
        best = min(results)
        print(f"[select_sweep] BEST: CB_SEL={best[1]} KGROUP={best[2]} "
              f"at {best[0]:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
