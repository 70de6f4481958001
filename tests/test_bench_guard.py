"""MFU-pipeline sanity guard (scripts/bench_all.py).

The round-4 bench shipped 0.07% sampler MFUs because XLA's cost analysis
counts a lax.scan body once, not times its trip count, and the chain
multiplier was missing. The guard must refuse to report an MFU outside the
compute-bound plausibility band so that class of bug can never reach a
BENCH artifact silently again.
"""

import os
import sys

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import bench_all  # noqa: E402
import ddpm_tpu.utils.profiling as profiling  # noqa: E402


@pytest.fixture(autouse=True)
def _pin_peak_flops(monkeypatch):
    # the guard tests assume the v5e default; a DDPM_TPU_PEAK_FLOPS export
    # (the documented other-hardware knob) must not flip their outcomes
    monkeypatch.setattr(profiling, "PEAK_FLOPS", 197e12)


def test_mfu_guard_rejects_unchained_sampler_flops():
    """Feeding the DDPM-1000 sampler's measured rate with UNCHAINED flops
    (one forward instead of 1000) must raise, not return 0.07%."""
    one_forward = 1.2e10  # ~CIFAR UNet forward, FLOPs
    with pytest.raises(AssertionError, match="implausible MFU"):
        bench_all._mfu(12.6, one_forward)


def test_mfu_guard_accepts_chained_flops():
    mfu = bench_all._mfu(12.6, 1.2e10 * 1000)
    assert 0.02 <= mfu <= 1.0


def test_mfu_guard_rejects_overcounting():
    """>100% of peak is as impossible as ~0%: flops were double-counted."""
    with pytest.raises(AssertionError, match="implausible MFU"):
        bench_all._mfu(12.6, 1.2e10 * 1000 * 50)


def test_mfu_non_compute_bound_passthrough():
    assert bench_all._mfu(12.6, 1.2e10, compute_bound=False) < 0.001
    assert bench_all._mfu(12.6, None) is None


def test_flops_per_item_chain_multiplier():
    """_flops_per_item(chain=k) must scale the scanned body's flops by k —
    the exact invariant whose violation produced the round-4 garbage."""

    def scanned(x):
        def body(c, _):
            return c @ c, None

        c, _ = jax.lax.scan(body, x, None, length=7)
        return c

    jitted = jax.jit(scanned)
    x = jnp.ones((64, 64), jnp.float32)
    f1 = bench_all._flops_per_item(jitted, 1, x, chain=1)
    f7 = bench_all._flops_per_item(jitted, 1, x, chain=7)
    if f1 is None:
        pytest.skip("backend exposes no cost analysis")
    assert f7 == pytest.approx(7 * f1)
    # and the body is counted ONCE by XLA regardless of trip count: one
    # 64x64x64 matmul = 2*64^3 flops, far below 7x that
    assert f1 < 3 * 2 * 64**3
