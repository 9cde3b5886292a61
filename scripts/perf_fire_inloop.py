"""IN-LOOP per-fire (rebuild+select) cost: run the real 300-step jitted
tracking loop at several fire frequencies and linearly solve ms/step vs
fires/step for the per-fire cost and the fire-free step floor.

Motivation: standalone per-call timings through the axon relay carry
output-size-proportional overhead (runs/tpu_session_r3b/perf_fire.log:
a 126 MB elementwise proj8 pass "measures" 25 ms against a ~0.3 ms
speed-of-light), so the only honest fire-cost probe is differential
in-loop measurement — same methodology as bench.py, which this reuses
(fixed 300 steps, host-value read, rebuild/select counters).

Knobs swept: resort_motion_px/select_motion_px scaled together so the
loop fires more/less often at identical step math. The loop recompiles
per config (gates are Python-level constants), so each row costs one
compile; run with JAX_COMPILATION_CACHE_DIR set.
"""

import sys
import time

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


def main():
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

    rows = []
    # two-axis gate sweep: tighter gates -> more fires at identical step
    # math. 1e9 = never fire after the first (the step-floor anchor).
    # Select-only rows (rebuild gate pinned open) separate the SELECT
    # fire's cost from the rebuild's — the two fire at independent rates
    # in the product loop (rb 4 px / select 2 px) and the select is the
    # accuracy dial (VERDICT r3 next #4).
    # argv[1] == "select": the 3-row select-only subset (floor + c_sel),
    # for quick in-loop A/Bs of the select-kernel env knobs
    # (GSPLATLOC_KCOVER_SEL_CB / GSPLATLOC_SEL_KGROUP, read at import).
    configs = ((1e9, 1e9), (2.0, 2.0), (0.5, 0.5),
               (1e9, 2.0), (1e9, 0.5), (1e9, 0.125))
    if len(sys.argv) > 1 and sys.argv[1] == "select":
        configs = ((1e9, 1e9), (1e9, 0.5), (1e9, 0.125))
    for rb_gate, sel_gate in configs:
        cfg = TrackingConfig(
            max_steps=300, patience=10_000, warmup_steps=100,
            early_stop=False, resort_every=10, subtile=True, kcover=16,
            resort_motion_px=rb_gate, select_motion_px=sel_gate,
            coast_after_steps=0,  # coast off: fires stay gate-driven
        )
        res = optimize_pose(scene, jnp.eye(4), depth_gt, K, W, H,
                            config=cfg, backend="fused")
        float(res.best_loss)  # compile + warm
        t0 = time.time()
        res = optimize_pose(scene, jnp.eye(4), depth_gt, K, W, H,
                            config=cfg, backend="fused")
        float(res.best_loss)
        dt = time.time() - t0
        steps = int(res.steps_run)
        rb, sel = int(res.rebuilds), int(res.selects)
        ms = dt / steps * 1e3
        rows.append((ms, rb, sel, steps))
        print(f"gates rb={rb_gate:>6} sel={sel_gate:>6}: {ms:6.2f} "
              f"ms/step  rebuilds {rb:3d} selects {sel:3d} "
              f"({steps} steps)", flush=True)

    # least-squares ms/step = floor + c_rb*rb/steps + c_sel*sel/steps
    # (a rebuild always co-fires a select, so c_rb is the rebuild's
    # MARGINAL cost on top of the select it forces)
    a = np.array([[1.0, r[1] / r[3], r[2] / r[3]] for r in rows])
    y = np.array([r[0] for r in rows])
    if np.all(a[:, 1] == 0.0):  # select-only subset: fit floor + c_sel
        (floor, c_sel), *_ = np.linalg.lstsq(a[:, [0, 2]], y, rcond=None)
        print(f"fit: step floor {floor:.2f} ms + {c_sel:.1f} ms/select "
              f"(select-only rows)", flush=True)
        return
    (floor, c_rb, c_sel), *_ = np.linalg.lstsq(a, y, rcond=None)
    print(f"fit: step floor {floor:.2f} ms + {c_rb:.1f} ms/rebuild "
          f"(marginal) + {c_sel:.1f} ms/select", flush=True)


if __name__ == "__main__":
    main()
