"""Split the on-chip select-kernel cost into WALK vs EXTRACTION.

The r4c profile pinned the select fire at 44.5 ms/device-call but a
pallas_call is opaque to the profiler. This probe times
build_kcover_buffer standalone (its 282 MB kbuf output is the REAL
product output, so standalone timing here is not relay-confounded the
way small-output probes are — the output DMA is the same either way)
under GSPLATLOC_SEL_NOEXTRACT=0/1: the flag removes only the per-k
extraction mask+matvec+cond iterations while keeping the walk depth and
output shape identical. The difference is the extraction's share.

Runs ITSELF twice via subprocess (the flag is read at import).
Usage: python scripts/perf_select_split.py [reps]
"""

import os
import subprocess
import sys
import time


def measure(reps: int) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gsplatloc_tpu.data.synthetic import box_room_frame
    from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
    from gsplatloc_tpu.ops import camera
    from gsplatloc_tpu.ops.fused_subtile import build_subtile_slot_buffer
    from gsplatloc_tpu.ops.fused_tracking import cam_vector
    from gsplatloc_tpu.ops.kcover import build_kcover_buffer
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
    slot, meta, _ = build_subtile_slot_buffer(scene, vm, K, W, H, 1e-2,
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
    dt = (time.time() - t0) / reps
    return dt


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    if os.environ.get("_SEL_SPLIT_CHILD") == "1":
        dt = measure(reps)
        print(f"RESULT {dt*1e3:.2f}", flush=True)
        return
    results = {}
    for flag in ("0", "1"):
        env = dict(os.environ, _SEL_SPLIT_CHILD="1",
                   GSPLATLOC_SEL_NOEXTRACT=flag,
                   GSPLATLOC_SEL_NOEXTRACT_PROBE=flag)
        out = subprocess.run(
            [sys.executable, __file__, str(reps)], env=env,
            capture_output=True, text=True, timeout=3000)
        line = [ln for ln in out.stdout.splitlines()
                if ln.startswith("RESULT")]
        if not line:
            print(f"flag={flag} FAILED:\n{out.stdout[-2000:]}\n"
                  f"{out.stderr[-2000:]}")
            return
        results[flag] = float(line[0].split()[1])
        print(f"[select_split] NOEXTRACT={flag}: {results[flag]:.2f} "
              f"ms/select (incl. dispatch; {reps} reps)", flush=True)
    walk = results["1"]
    full = results["0"]
    print(f"[select_split] extraction share = {full - walk:.2f} ms "
          f"of {full:.2f} (walk+DMA+dispatch = {walk:.2f})", flush=True)


if __name__ == "__main__":
    main()
