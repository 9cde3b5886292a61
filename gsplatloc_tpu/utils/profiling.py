"""Profiling hooks: jax.profiler traces + lightweight wall-clock timers.

The reference only keeps ad-hoc wall-clock timers for the viewer
(gs_trainer_total.py:82,270-281; SURVEY.md §5). Here: a context manager for
XLA profiler traces (viewable in TensorBoard/xprof) and a timer registry
that feeds rays/s-style throughput counters.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

_TIMERS: dict[str, list[float]] = defaultdict(list)


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/gsplatloc_trace"):
    """Capture a jax.profiler trace around the block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class _TimerHandle:
    """Registers values produced INSIDE a time_block to block on at exit."""

    def __init__(self):
        self._watched = []

    def watch(self, x):
        """Register a pytree (returns it unchanged): the block's timer
        waits for its device computation before stopping."""
        self._watched.append(x)
        return x


@contextlib.contextmanager
def time_block(name: str, sync=None):
    """Wall-clock timer. Async device work must be blocked on or the timer
    records only dispatch: register the block's OWN results via the yielded
    handle (`with time_block("step") as tb: y = tb.watch(f(x))`); `sync=`
    only works for values that already exist at entry. NOTE under a remote
    relay block_until_ready can return early — for fully honest timing read
    a host value (see docs/PERFORMANCE.md methodology)."""
    import jax

    handle = _TimerHandle()
    t0 = time.perf_counter()
    yield handle
    for x in handle._watched:
        jax.block_until_ready(x)
    if sync is not None:
        jax.block_until_ready(sync)
    _TIMERS[name].append(time.perf_counter() - t0)


def timer_stats(name: str) -> dict:
    v = _TIMERS.get(name, [])
    if not v:
        return {}
    return {
        "count": len(v),
        "mean_s": sum(v) / len(v),
        "min_s": min(v),
        "total_s": sum(v),
    }


def rays_per_sec(pixels_per_step: int, step_time_s: float) -> float:
    """Pixels(rays)/s counter (reference viewer stat, trainer :270-281)."""
    return pixels_per_step / max(step_time_s, 1e-12)


def reset_timers():
    _TIMERS.clear()
