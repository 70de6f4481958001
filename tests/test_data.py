"""Data pipeline tests: registry, sharded loader semantics, toy stats."""

import numpy as np
import pytest

from ddpm_tpu.data import DATASET_DICT, DATASET_INFO
from ddpm_tpu.data.datasets import FakeData
from ddpm_tpu.data.loader import ShardedLoader, train_val_split
from ddpm_tpu.data.toy import DataStreamer, Gaussian8, Gaussian25, SwissRoll
from ddpm_tpu.data.transforms import normalize_to_unit, random_hflip, to_uint8


def test_registry_contains_all_datasets():
    for name in ("mnist", "cifar10", "celeba", "celeba_hq", "fakedata"):
        assert name in DATASET_DICT, name
        assert name in DATASET_INFO


def test_dataset_info_static():
    assert DATASET_INFO["cifar10"]["train_size"] == 50000
    assert DATASET_INFO["celeba"]["all_size"] == 202599
    assert DATASET_INFO["mnist"]["resolution"] == (32, 32)


def test_loader_epoch_shuffle_deterministic():
    ds = FakeData(size=64, resolution=8)
    a = ShardedLoader(ds, 16, seed=1)
    b = ShardedLoader(ds, 16, seed=1)
    a.set_epoch(2), b.set_epoch(2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # different epoch -> different order
    b.set_epoch(3)
    diff = any(not np.array_equal(x, y) for x, y in zip(a, b))
    assert diff


def test_loader_sharding_partitions():
    """Shards see disjoint, collectively-exhaustive examples per epoch."""
    ds = FakeData(size=64, resolution=8)
    shards = [
        ShardedLoader(ds, 32, seed=0, num_shards=4, shard_index=i, raw=True)
        for i in range(4)
    ]
    assert all(s.local_batch == 8 for s in shards)
    seen = []
    for s in shards:
        for batch in s:
            seen.extend(batch.reshape(len(batch), -1).sum(1).tolist())
    assert len(seen) == 64


def test_loader_normalized_range():
    ds = FakeData(size=32, resolution=8)
    batch = next(iter(ShardedLoader(ds, 16, seed=0)))
    assert batch.dtype == np.float32
    assert batch.min() >= -1.0 and batch.max() <= 1.0


def test_loader_drop_last():
    ds = FakeData(size=70, resolution=8)
    loader = ShardedLoader(ds, 16, drop_last=True)
    assert len(list(loader)) == 4  # 70 // 16


def test_train_val_split_seeded():
    t1, v1 = train_val_split(100, 0.2, random_seed=9)
    t2, v2 = train_val_split(100, 0.2, random_seed=9)
    np.testing.assert_array_equal(t1, t2)
    assert len(v1) == 20 and len(t1) == 80
    assert len(np.intersect1d(t1, v1)) == 0


def test_uint8_roundtrip():
    u8 = np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1)
    x = normalize_to_unit(u8)
    back = to_uint8(x)
    np.testing.assert_array_equal(u8, back)


def test_random_hflip_only_flips_horizontally():
    rng = np.random.default_rng(0)
    batch = np.arange(2 * 4 * 4 * 1, dtype=np.uint8).reshape(2, 4, 4, 1)
    out = random_hflip(batch, rng, p=1.0)
    np.testing.assert_array_equal(out, batch[:, :, ::-1])


@pytest.mark.parametrize("cls", [Gaussian8, Gaussian25, SwissRoll])
def test_toy_datasets_unit_scale(cls):
    data = cls(20000, random_state=0).data
    assert data.shape == (20000, 2)
    # normalized to ~unit per-axis variance
    v = data.var(axis=0)
    assert np.all(v > 0.5) and np.all(v < 1.5), v


def test_data_streamer_epochs():
    ds = DataStreamer("gaussian8", batch_size=32, num_batches=4)
    batches = list(ds)
    assert len(batches) == 4
    assert all(b.shape == (32, 2) for b in batches)
