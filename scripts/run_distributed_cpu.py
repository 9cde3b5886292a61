"""REAL multi-process jax.distributed validation (VERDICT r3 next #5).

parallel/distributed.py's initialize/global_tile_mesh/shard_scenes had only
ever run single-process; this script launches TWO separate python processes
on the CPU backend (coordinator on localhost), each owning 4 virtual XLA
CPU devices, and drives the cross-host code path for real:

  * jax.distributed.initialize(coordinator, num_processes=2, process_id=i)
    -> a global cluster of 8 devices across 2 OS processes;
  * global_tile_mesh() over the GLOBAL device list; a fused tracking
    optimize_pose (2 steps) runs SPMD over it — macro-tile rows sharded
    across both processes' devices, pose gradients psum'd across the
    process boundary (the DCN analogue on real pods);
  * shard_scenes() room-level DP (each process takes rooms[i::2]);
  * the parent compares both processes' results (they must agree bitwise —
    same SPMD program, replicated outputs) and checks the final pose moved.

Correctness-only: 2 virtual-device processes on one box say nothing about
perf (SURVEY §2.3 multi-host row; real >=80%-at-2-hosts needs pod hardware).

Usage:
  python scripts/run_distributed_cpu.py              # parent: spawn + check
  python scripts/run_distributed_cpu.py --process-id 0 --num-processes 2 \
      --coordinator localhost:9876                   # child (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path


def child(args) -> None:
    # each process gets its own 4 virtual CPU devices; must be set before
    # the first jax import in THIS process
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    # the axon TPU plugin force-sets jax_platforms programmatically; env
    # vars alone do not keep a process off the TPU (tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

    from gsplatloc_tpu.parallel.distributed import (
        global_tile_mesh, initialize, shard_scenes,
    )

    active = initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    out = {
        "process_id": args.process_id,
        "distributed_active": bool(active),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }
    assert active, "initialize() returned single-process"
    assert jax.process_count() == args.num_processes
    assert jax.device_count() == 4 * args.num_processes

    import jax.numpy as jnp
    import numpy as np

    from gsplatloc_tpu.data.synthetic import random_gaussian_cloud
    from gsplatloc_tpu.models.gaussians import scene_from_point_cloud
    from gsplatloc_tpu.ops import camera
    from gsplatloc_tpu.ops.fused_tracking import (
        build_slot_buffer, render_tracking_depth,
    )
    from gsplatloc_tpu.ops.lie import invert_se3
    from gsplatloc_tpu.opt.tracking import TrackingConfig, optimize_pose

    # identical inputs in every process (same seed) -> numpy args to jit
    # are valid fully-replicated global arrays
    n_dev = jax.device_count()
    h, w = 16 * n_dev, 128
    rng = np.random.default_rng(0)
    pts, rgb = random_gaussian_cloud(rng, 400)
    scene = scene_from_point_cloud(jnp.asarray(pts), jnp.asarray(rgb))
    scene = scene._replace(scales=jnp.full_like(scene.scales, 0.05))
    K = camera.intrinsics_matrix(60.0, 60.0, w / 2 - 0.5, h / 2 - 0.5)

    mesh = global_tile_mesh()
    assert len(mesh.devices.ravel()) == n_dev
    slot, meta, _ = build_slot_buffer(scene, invert_se3(jnp.eye(4)), K, w, h,
                                      1e-2, 1e10)
    depth_gt, _ = render_tracking_depth(invert_se3(jnp.eye(4)), K, w, h,
                                        slot, meta)
    cfg = TrackingConfig(max_steps=2, patience=10, warmup_steps=0,
                         resort_every=100, kcover=0, subtile=False)
    t0 = time.time()
    res = optimize_pose(scene, jnp.eye(4),
                        jax.lax.stop_gradient(depth_gt), K, w, h,
                        config=cfg, backend="fused", mesh=mesh)
    # replicated outputs: every process can read the full value
    final_trans = np.asarray(jax.device_get(res.final_pose.trans),
                             np.float64)
    out.update(
        steps_run=int(res.steps_run),
        best_loss=float(res.best_loss),
        final_trans=[float(v) for v in final_trans],
        rooms=shard_scenes([f"room{i}" for i in range(5)]),
        wall_s=round(time.time() - t0, 2),
    )
    print("RESULT " + json.dumps(out), flush=True)


def parent() -> int:
    port = 19731
    n_proc = 2
    procs = []
    logs = []
    env = dict(os.environ)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    for pid in range(n_proc):
        log = open(f"/tmp/dist_cpu_p{pid}.log", "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, __file__, "--process-id", str(pid),
             "--num-processes", str(n_proc),
             "--coordinator", f"localhost:{port}"],
            stdout=log, stderr=subprocess.STDOUT, env=env,
        ))
    deadline = time.time() + 900
    for p in procs:
        p.wait(timeout=max(5, deadline - time.time()))
    for log in logs:
        log.close()
    results = {}
    for pid in range(n_proc):
        text = Path(f"/tmp/dist_cpu_p{pid}.log").read_text()
        print(f"--- process {pid} ---\n{text}")
        for line in text.splitlines():
            if line.startswith("RESULT "):
                results[pid] = json.loads(line[len("RESULT "):])
    ok = (
        len(results) == n_proc
        and all(r["distributed_active"] and r["process_count"] == n_proc
                and r["global_devices"] == 4 * n_proc for r in results.values())
        and results[0]["final_trans"] == results[1]["final_trans"]
        and results[0]["steps_run"] == 2
        and any(abs(v) > 0 for v in results[0]["final_trans"])
        # room-level DP: disjoint halves covering all rooms
        and sorted(results[0]["rooms"] + results[1]["rooms"])
        == [f"room{i}" for i in range(5)]
    )
    print(json.dumps({
        "ok": ok,
        "final_trans_agree": (results.get(0, {}).get("final_trans")
                              == results.get(1, {}).get("final_trans")),
        "results": results,
    }, indent=2))
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--coordinator", default="localhost:19731")
    args = ap.parse_args()
    if args.process_id is None:
        sys.exit(parent())
    child(args)


if __name__ == "__main__":
    main()
