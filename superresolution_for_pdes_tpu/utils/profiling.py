"""Tracing and timing utilities.

The reference's only instrumentation is ad-hoc ``time.time()`` spans
(``/root/reference/src/resolution_comparison_statistical.py:74-90,143-168``).
Here: a ``jax.profiler`` trace context for real TPU traces (viewable in
TensorBoard/XProf/Perfetto), honest wall-clock timers that synchronize with
``block_until_ready``, and throughput counters (solves/sec, samples/sec) as
first-class metrics.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/jax_trace") -> Iterator[None]:
    """Capture a jax.profiler device trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(result: Dict[str, float], key: str) -> Iterator[None]:
    """Wall-clock a block; synchronizes outstanding device work at exit
    boundaries only if the block does (callers should block_until_ready)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        result[key] = time.perf_counter() - t0


def time_fn(fn, *args, reps: int = 10, warmup: int = 1, **kwargs) -> float:
    """Mean seconds/call of a device function, synchronized per run.

    Per the axon-tunnel caveat (see the project verify skill): for pure device
    throughput, prefer folding the rep loop into the jitted program; this
    helper measures end-to-end call latency including dispatch.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


@dataclass
class ThroughputCounter:
    """Accumulating items/sec counter (solves/sec, samples/sec, tiles/sec)."""

    items: int = 0
    seconds: float = 0.0
    _t0: float | None = field(default=None, repr=False)

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, items: int) -> None:
        if self._t0 is None:
            raise RuntimeError("stop() without start()")
        self.seconds += time.perf_counter() - self._t0
        self.items += items
        self._t0 = None

    @property
    def per_second(self) -> float:
        return self.items / self.seconds if self.seconds > 0 else 0.0
