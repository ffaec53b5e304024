"""Profiling: named region timers + jax profiler trace hooks.

The reference uses dolfinx.common.Timer context managers + timing lookups
(demo/assembly_strategies.py:128-150, SURVEY §5). TPU equivalent: wall-clock
region timers fenced with ``block_until_ready`` plus an optional
``jax.profiler.trace`` capture for in-depth device timelines.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

import jax

_timings: dict[str, list[float]] = defaultdict(list)


@contextmanager
def Timer(name: str, sync=None):
    """Region timer. Pass ``sync=arrays`` (any pytree) to fence on device
    completion before stopping the clock."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        _timings[name].append(time.perf_counter() - t0)


def timing(name: str) -> tuple[int, float, float]:
    """(count, total, mean) for a named region — dolfinx.common.timing shape."""
    ts = _timings.get(name, [])
    total = sum(ts)
    return len(ts), total, total / len(ts) if ts else 0.0


def timing_table() -> str:
    rows = ["{:<40s} {:>6s} {:>12s} {:>12s}".format("region", "calls", "total [s]", "mean [s]")]
    for name in sorted(_timings):
        n, tot, mean = timing(name)
        rows.append(f"{name:<40s} {n:>6d} {tot:>12.4f} {mean:>12.6f}")
    return "\n".join(rows)


def reset_timings() -> None:
    _timings.clear()


@contextmanager
def profiler_trace(logdir: str = "/tmp/oasisx_tpu_trace"):
    """Capture a jax profiler trace of the enclosed region (TensorBoard)."""
    with jax.profiler.trace(logdir):
        yield
