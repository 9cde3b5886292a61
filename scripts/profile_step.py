"""On-chip profile of the PRODUCT tracking step at bench scale
(VERDICT r3 next #3): capture a jax.profiler trace of the jitted
300-step optimize_pose loop (816k splats, 1200x680, product gates — the
exact BENCH configuration) and reduce it to a measured per-op stage
table, replacing docs/PERFORMANCE.md's by-subtraction residual
attribution.

Writes runs/<out>/:
  trace/...                the raw xplane artifact (TensorBoard-viewable)
  op_stats.json            top ops by self time (from xprof conversion)
  summary.txt              human-readable stage table

The conversion runs locally via the xprof package (no TensorBoard server
needed). If trace capture yields no device data (a possible axon-relay
wall), the script says so explicitly — that outcome is the documented
wall, not a silent empty artifact.

Usage: python scripts/profile_step.py [outdir]
"""

import json
import sys
import time
from pathlib import Path

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


def bench_scene():
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
    return scene, depth_gt, K, W, H


def main():
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "runs/profile_step")
    out.mkdir(parents=True, exist_ok=True)
    trace_dir = out / "trace"

    scene, depth_gt, K, W, H = bench_scene()
    cfg = TrackingConfig(max_steps=300, patience=10_000, warmup_steps=100,
                         early_stop=False, subtile=True, kcover=16)

    # compile + warm OUTSIDE the trace
    res = optimize_pose(scene, jnp.eye(4), depth_gt, K, W, H, config=cfg,
                        backend="fused")
    float(res.best_loss)

    t0 = time.time()
    jax.profiler.start_trace(str(trace_dir))
    res = optimize_pose(scene, jnp.eye(4), depth_gt, K, W, H, config=cfg,
                        backend="fused")
    float(res.best_loss)  # host-value read: the honest completion barrier
    jax.profiler.stop_trace()
    dt = time.time() - t0
    steps = int(res.steps_run)
    print(f"[profile] traced {steps} steps in {dt:.2f}s "
          f"({dt/steps*1e3:.2f} ms/step, rebuilds {int(res.rebuilds)}, "
          f"selects {int(res.selects)})")

    xplanes = sorted(trace_dir.rglob("*.xplane.pb"))
    print(f"[profile] xplane artifacts: {[str(p) for p in xplanes]}")
    if not xplanes:
        print("[profile] NO xplane captured — trace capture is a wall "
              "under this runtime; rely on differential in-loop "
              "measurement (scripts/perf_fire_inloop.py)")
        return

    # Reduce to op stats via the local xprof converter
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except Exception as e:  # noqa: BLE001
        print(f"[profile] xprof import failed ({e}); raw trace kept")
        return
    paths = [str(p) for p in xplanes]
    summary_lines = [f"{steps} steps, {dt/steps*1e3:.2f} ms/step wall, "
                     f"rebuilds {int(res.rebuilds)} selects "
                     f"{int(res.selects)}"]
    for tool in ("framework_op_stats", "op_profile", "overview_page"):
        try:
            data, _ = rtd.xspace_to_tool_data(paths, tool, {})
            if isinstance(data, bytes):
                try:
                    data = data.decode()
                except UnicodeDecodeError:
                    (out / f"{tool}.bin").write_bytes(data)
                    print(f"[profile] {tool}: binary blob saved")
                    continue
            (out / f"{tool}.json").write_text(data)
            print(f"[profile] {tool}: saved ({len(data)} bytes)")
        except Exception as e:  # noqa: BLE001
            print(f"[profile] {tool} conversion failed: "
                  f"{type(e).__name__}: {e}")

    # Try to print a compact top-op table from framework_op_stats
    fos = out / "framework_op_stats.json"
    if fos.exists():
        try:
            j = json.loads(fos.read_text())
            # tensorstats schema: list of tables w/ rows of
            # [rank, host/device, type, name, occurrences, total_time,
            #  avg, total_self, avg_self, ...]
            rows = []
            for table in j if isinstance(j, list) else [j]:
                for r in table.get("p", {}).get("rows", []) if isinstance(
                        table, dict) else []:
                    rows.append(r)
            if rows:
                print("[profile] top rows:", rows[:5])
        except Exception as e:  # noqa: BLE001
            print(f"[profile] stats parse: {type(e).__name__}: {e}")
    (out / "summary.txt").write_text("\n".join(summary_lines) + "\n")


if __name__ == "__main__":
    main()
