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

__all__ = [
    "trace",
    "StepTimer",
    "annotate",
    "value_sync",
    "PEAK_FLOPS",
    "flops_per_item",
    "mfu",
]

# bf16 peak of one TPU v5e chip (matmul units). Override with
# DDPM_TPU_PEAK_FLOPS when running on other hardware.
import os as _os

PEAK_FLOPS = float(_os.environ.get("DDPM_TPU_PEAK_FLOPS", 197e12))


def flops_per_item(jitted, n_items, *args, chain: int = 1):
    """FLOPs per image/sample from XLA's cost analysis of the COMPILED
    program (one MAC = 2 flops). Returns None when the backend doesn't
    expose cost analysis.

    ``chain``: XLA's cost analysis counts a ``lax.scan`` body ONCE, not
    times its trip count — samplers must pass their chain length (1000 for
    DDPM, subsequence size for DDIM) or their MFU comes out ~1/chain of
    reality (the round-4 bench_all run shipped 0.1% sampler MFUs this way).
    The non-scan prologue (noise init) gets multiplied too; it is <0.1% of
    a model forward, far below run-to-run noise."""
    try:
        analysis = jitted.lower(*args).compile().cost_analysis()
        if isinstance(analysis, (list, tuple)):
            analysis = analysis[0]
        flops = analysis.get("flops", 0.0)
        return float(flops) * chain / n_items if flops else None
    except Exception:
        return None


def mfu(rate_per_chip: float, per_item_flops, compute_bound: bool = True):
    """Model FLOPs utilization: measured items/s/chip x FLOPs/item vs the
    chip's peak.

    Sanity guard: a compute-bound workload's plausible MFU lives in
    [2%, 100%]. Anything outside that band means the FLOPs accounting is
    broken (e.g. a missing scan chain multiplier — the round-4 bench
    shipped 0.07% sampler MFUs that way, logs/bench_all_r04.log), and this
    raises rather than let a silently-wrong figure reach a BENCH artifact.
    Pass ``compute_bound=False`` only for workloads genuinely dominated by
    non-FLOPs work."""
    if per_item_flops is None:
        return None
    util = rate_per_chip * per_item_flops / PEAK_FLOPS
    if compute_bound and not (0.02 <= util <= 1.0):
        raise AssertionError(
            f"implausible MFU {util:.2%} for a compute-bound workload "
            f"(rate={rate_per_chip:.2f}/s, flops/item={per_item_flops:.3e}): "
            "scan chain multiplier missing from the cost analysis, or "
            "FLOPs overcounted — refusing to report"
        )
    return util


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
