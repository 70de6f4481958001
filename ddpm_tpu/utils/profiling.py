"""Profiling / step-timing subsystem (optional, first-class).

The reference has no tracing at all (SURVEY.md §5: tqdm only + cudnn
autotune). On TPU the equivalents are:
  * ``trace(logdir)`` — context manager around ``jax.profiler`` capturing a
    device trace viewable in TensorBoard/XProf/Perfetto;
  * ``StepTimer`` — wall-clock step timing with explicit value-fetch sync
    points, reporting imgs/sec and p50/p90 latencies without perturbing
    steady-state dispatch.

Sync caveat: on remotely-attached devices (axon tunnel),
``jax.block_until_ready`` can return before device execution finishes,
inflating throughput ~9x. The only reliable sync is fetching a computed
value — ``value_sync`` below does that with a single-element transfer.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax
import numpy as np

__all__ = ["trace", "StepTimer", "annotate", "value_sync"]


def value_sync(result) -> None:
    """Wait for ``result`` by fetching one element of its first leaf.

    Unlike ``block_until_ready`` this cannot complete before the device has
    produced the value, so it is an honest sync point on every backend.
    """
    leaf = jax.tree.leaves(result)[0]
    ndim = getattr(leaf, "ndim", 0)
    jax.device_get(leaf[(0,) * ndim] if ndim else leaf)


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler device trace for the enclosed block."""
    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span that shows up in the device trace."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Measures steady-state step time around a jitted step function."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.times: List[float] = []
        self._count = 0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            value_sync(result)
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return dt

    def summary(self, items_per_step: int = 1) -> dict:
        if not self.times:
            return {}
        t = np.asarray(self.times)
        return {
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p90_s": float(np.percentile(t, 90)),
            "items_per_sec": items_per_step / float(t.mean()),
            "steps": len(t),
        }
