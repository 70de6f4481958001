"""Native (C++) batch-ops tests — skipped when the library isn't built."""

import numpy as np
import pytest

from ddpm_tpu import native
from ddpm_tpu.data.datasets import FakeData
from ddpm_tpu.data.loader import ShardedLoader

pytestmark = pytest.mark.skipif(not native.available(), reason="libbatchops.so not built")


def test_gather_flip_normalize_matches_numpy():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (20, 8, 8, 3), dtype=np.uint8)
    idx = np.array([5, 0, 19, 7], np.int64)
    flips = np.array([0, 1, 1, 0], np.uint8)
    out = native.gather_flip_normalize(imgs, idx, flips)
    expect = imgs[idx].astype(np.float32) / 127.5 - 1.0
    expect[flips.astype(bool)] = expect[flips.astype(bool)][:, :, ::-1]
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_gather_no_flips():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (10, 4, 4, 1), dtype=np.uint8)
    idx = np.arange(10, dtype=np.int64)
    out = native.gather_flip_normalize(imgs, idx, None)
    np.testing.assert_allclose(out, imgs.astype(np.float32) / 127.5 - 1.0, atol=1e-6)


def test_float_to_uint8_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.uniform(-1.3, 1.3, (4, 8, 8, 3)).astype(np.float32)
    out = native.float_to_uint8(x)
    expect = np.clip(np.rint(x * 127.5 + 127.5), 0, 255).astype(np.uint8)
    # rounding mode at exact .5 may differ by 1 ulp
    assert np.abs(out.astype(int) - expect.astype(int)).max() <= 1


def test_loader_native_path_matches_reference_path():
    """Loader output with/without the native fast path must be identical."""
    ds = FakeData(size=64, resolution=8)
    a = ShardedLoader(ds, 16, seed=3)
    batches_native = [b.copy() for b in a]

    # force the numpy path by monkeypatching availability
    import ddpm_tpu.native as nat

    orig = nat.available
    nat.available = lambda: False
    try:
        b = ShardedLoader(ds, 16, seed=3)
        batches_numpy = list(b)
    finally:
        nat.available = orig
    for x, y in zip(batches_native, batches_numpy):
        np.testing.assert_allclose(x, y, atol=1e-6)


def test_gather_flip_u8_matches_numpy():
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 256, (20, 8, 8, 3), dtype=np.uint8)
    idx = np.array([3, 11, 0, 19], np.int64)
    flips = np.array([1, 0, 1, 0], np.uint8)
    out = native.gather_flip_u8(imgs, idx, flips)
    assert out.dtype == np.uint8
    expect = imgs[idx].copy()
    expect[flips.astype(bool)] = expect[flips.astype(bool)][:, :, ::-1]
    np.testing.assert_array_equal(out, expect)


def test_loader_device_normalize_native_matches_numpy():
    """device_normalize=True (the production train path, train.py) must
    yield identical uint8 batches through the native u8 kernel and the
    numpy fallback, including the flip RNG stream."""
    import ddpm_tpu.native as nat

    ds = FakeData(size=64, resolution=8)
    ds.random_flip = True
    a = ShardedLoader(ds, 16, seed=5, device_normalize=True)
    batches_native = [b.copy() for b in a]
    assert batches_native and batches_native[0].dtype == np.uint8

    orig = nat.u8_available
    nat.u8_available = lambda: False
    try:
        b = ShardedLoader(ds, 16, seed=5, device_normalize=True)
        batches_numpy = list(b)
    finally:
        nat.u8_available = orig
    for x, y in zip(batches_native, batches_numpy):
        np.testing.assert_array_equal(x, y)
