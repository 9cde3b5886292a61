"""Multi-host bootstrap: jax.distributed + global tile meshes + scene
sharding across hosts.

The reference is strictly single-process/single-GPU (SURVEY.md §2.3; its
only "parallelism" is a shell script launching one python per room,
scripts/run_eval.sh:4-24). On TPU pods the equivalents are:

  * WITHIN a scene: the ("tiles",) mesh spans the global device list after
    `initialize()` — the rasterizer's tile rows shard over all chips of all
    hosts, pose gradients all-reduce over ICI within a slice and DCN across
    slices (parallel/sharded.py works unchanged: shard_map is SPMD over
    whatever mesh it is given).
  * ACROSS scenes: embarrassing parallelism — `shard_scenes` gives each
    host process its subset of rooms (the DP row of SURVEY §2.3), each
    tracked on the host's local chips.

Single-process initialize (num_processes=1) is exercised in CI
(tests/test_sharded.py); real pods supply coordinator/process ids via the
TPU runtime environment.
"""

from __future__ import annotations

import jax

_INIT = {"done": False}


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed for multi-host execution.

    With no arguments, relies on the TPU runtime's automatic cluster
    detection (GCE metadata / megascale env). Returns True if distributed
    mode is active (more than one process or explicit initialization),
    False when running single-process (init skipped or 1-process cluster).
    Safe to call twice (second call is a no-op).
    """
    state = getattr(jax.distributed, "global_state", None)
    # num_processes=1 skips client creation inside jax, so jax's own state
    # can't witness a prior single-process init — track it ourselves
    already = _INIT["done"] or (state is not None
                                and state.client is not None)
    if not already:
        from jax._src import xla_bridge

        if xla_bridge.backends_are_initialized():
            if num_processes is not None and num_processes > 1:
                raise RuntimeError(
                    "initialize() must run before any JAX computation "
                    "(the XLA backend is already up)")
            # single-process: nothing to set up; fall through
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
    _INIT["done"] = True
    return jax.process_count() > 1


def global_tile_mesh():
    """("tiles",) mesh over the GLOBAL device list (all hosts). Per-host
    data feeding uses jax.make_array_from_process_local_data; the slot
    buffer is replicated, so every host builds it identically."""
    from .sharded import make_tile_mesh

    return make_tile_mesh(devices=jax.devices())


def shard_scenes(scenes: list, process_id: int | None = None,
                 process_count: int | None = None) -> list:
    """Scene-level data parallelism across host processes: process i takes
    scenes[i::P] (the TPU-pod equivalent of the reference's per-room
    process launcher, scripts/run_eval.sh:4-24)."""
    pid = jax.process_index() if process_id is None else process_id
    pcount = jax.process_count() if process_count is None else process_count
    return list(scenes)[pid::pcount]
