"""Metrics tests: streaming stats, Frechet distance, precision/recall."""

import numpy as np
import pytest

from ddpm_tpu.metrics import Manifold, ManifoldBuilder, StreamingStats, calc_fd, calc_pr
from ddpm_tpu.metrics.pr import compute_distance
from ddpm_tpu.metrics.toy import ToyEvaluator


def test_streaming_stats_match_batch():
    rng = np.random.default_rng(0)
    data = rng.standard_normal((1000, 16))
    stats = StreamingStats(dim=16)
    for i in range(0, 1000, 128):
        stats.update(data[i : i + 128])
    mu, sigma = stats.get_statistics()
    np.testing.assert_allclose(mu, data.mean(0), atol=1e-10)
    np.testing.assert_allclose(sigma, np.cov(data, rowvar=False, ddof=1), atol=1e-10)


def test_frechet_distance_identity():
    rng = np.random.default_rng(1)
    a = rng.standard_normal((500, 8))
    mu, sigma = a.mean(0), np.cov(a, rowvar=False, ddof=1)
    assert abs(calc_fd(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_distance_mean_shift():
    # identical covariances, shifted means: FD = ||dmu||^2
    mu1 = np.zeros(4)
    mu2 = np.ones(4) * 2.0
    sigma = np.eye(4)
    assert abs(calc_fd(mu1, sigma, mu2, sigma) - 16.0) < 1e-6


def test_compute_distance_matches_cdist():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((40, 8)).astype(np.float16)
    b = rng.standard_normal((30, 8)).astype(np.float16)
    d = compute_distance(a, b, row_batch_size=16, col_batch_size=16)
    expect = np.sqrt(
        ((a.astype(np.float64)[:, None] - b.astype(np.float64)[None]) ** 2).sum(-1)
    )
    np.testing.assert_allclose(d.astype(np.float64), expect, atol=2e-2)


def test_precision_recall_identical_sets():
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((200, 16)).astype(np.float16)
    m = ManifoldBuilder(features=feats, nhood_size=3, row_batch_size=64, col_batch_size=64)
    p, r = calc_pr(m.manifold, m.manifold, 64, 64)
    assert p == 1.0 and r == 1.0


def test_precision_recall_disjoint_sets():
    rng = np.random.default_rng(4)
    a = rng.standard_normal((100, 8)).astype(np.float16)
    b = (rng.standard_normal((100, 8)) + 100.0).astype(np.float16)
    ma = ManifoldBuilder(features=a, row_batch_size=64, col_batch_size=64).manifold
    mb = ManifoldBuilder(features=b, row_batch_size=64, col_batch_size=64).manifold
    p, r = calc_pr(ma, mb, 64, 64)
    assert p == 0.0 and r == 0.0


def test_manifold_save_load(tmp_path):
    rng = np.random.default_rng(5)
    feats = rng.standard_normal((50, 8)).astype(np.float16)
    builder = ManifoldBuilder(features=feats, row_batch_size=32, col_batch_size=32)
    path = str(tmp_path / "manifold.npz")
    builder.save(path)
    loaded = ManifoldBuilder.load(path)
    np.testing.assert_array_equal(loaded.features, builder.features)
    np.testing.assert_array_equal(loaded.kth, builder.kth)


def test_toy_evaluator_self_kld_near_zero():
    rng = np.random.default_rng(6)
    data = rng.standard_normal((30000, 2))
    ev = ToyEvaluator(data, total_size=30000, batch_size=30000)
    result = ev.eval(lambda n, i: data[:n])
    assert result["kld"] < 1e-6


def test_toy_evaluator_detects_mismatch():
    rng = np.random.default_rng(7)
    data = rng.standard_normal((20000, 2))
    shifted = data + 2.0
    ev = ToyEvaluator(data, total_size=20000, batch_size=20000)
    kld_self = ev.eval(lambda n, i: data[:n])["kld"]
    kld_shift = ev.eval(lambda n, i: shifted[:n])["kld"]
    assert kld_shift > kld_self + 1.0


def test_evaluator_end_to_end_with_injected_extractor(tmp_path):
    """Exercise the full in-loop Evaluator: target-stat fallback from the
    raw dataloader, batched generation with final-partial-batch padding,
    streaming stats, and the Frechet distance."""
    import jax

    from ddpm_tpu.metrics import Evaluator

    D = 16

    def extractor(x01):  # cheap stand-in embedding: channel-patch means
        x = np.asarray(x01, np.float32)
        B = x.shape[0]
        feats = x.reshape(B, -1)
        idx = np.linspace(0, feats.shape[1] - 1, D).astype(int)
        return feats[:, idx]

    ev = Evaluator(
        "fakedata",
        total_size=20,
        batch_size=8,  # 20 = 8 + 8 + 4 -> exercises the padded final batch
        precomputed_dir=str(tmp_path),
        extractor=extractor,
    )

    def sample_fn(n, key):
        return np.asarray(jax.random.uniform(key, (n, 32, 32, 3)) * 2.0 - 1.0)

    out = ev.eval(sample_fn)
    assert "fid" in out and np.isfinite(out["fid"]) and out["fid"] >= 0.0
    # target stats were persisted for reuse (reference eval.py:87-94 semantics)
    import os
    assert os.path.exists(os.path.join(str(tmp_path), "fid_stats_fakedata.npz"))


def test_data_parallel_extractor_matches_single_device(eight_devices):
    """Metric-model replication (reference nn.DataParallel,
    fid_score.py:111-113): batches shard over the mesh and results match the
    unsharded path bitwise, including the non-divisible (padded) case."""
    import jax
    import jax.numpy as jnp

    from ddpm_tpu.parallel import data_parallel_extractor, make_mesh

    variables = {"w": jnp.full((4,), 2.0)}

    def fn(v, x):
        return x.reshape(len(x), -1)[:, :4] * v["w"]

    mesh = make_mesh(eight_devices)
    extract = data_parallel_extractor(fn, variables, mesh=mesh)
    x = np.random.default_rng(0).random((16, 2, 4)).astype(np.float32)
    got = np.asarray(extract(x))
    want = np.asarray(fn(variables, jnp.asarray(x)))
    np.testing.assert_array_equal(got, want)

    # batch 11 is not divisible by 8: pad-and-drop path
    got = np.asarray(extract(x[:11]))
    np.testing.assert_array_equal(got, want[:11])

    # device arrays (e.g. sampler outputs) pad on device — no host round trip
    got = np.asarray(extract(jnp.asarray(x[:11])))
    np.testing.assert_array_equal(got, want[:11])


def test_inception_extractor_shards_over_mesh(eight_devices):
    """make_feature_extractor(data_parallel=True) must produce the same
    features as the plain jit path (tiny random-init Inception variables)."""
    import jax
    import jax.numpy as jnp

    from ddpm_tpu.metrics.inception import FIDInceptionV3, make_feature_extractor

    model = FIDInceptionV3(resize_input=False)
    x_init = jnp.zeros((1, 75, 75, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x_init)
    x = np.random.default_rng(1).random((8, 75, 75, 3)).astype(np.float32)
    sharded = make_feature_extractor(variables, data_parallel=True)
    plain = make_feature_extractor(variables, data_parallel=False)
    a, b = np.asarray(sharded(x)), np.asarray(plain(x))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_weights_cache_tag_keys_on_effective_path(monkeypatch):
    from ddpm_tpu.metrics import _STOCK_INCEPTION_WEIGHTS, weights_cache_tag

    # the stock converted-weight location: reference-compatible (untagged)
    # cache names — regardless of whether the env var spells it out
    monkeypatch.delenv("INCEPTION_NPZ", raising=False)
    assert weights_cache_tag(_STOCK_INCEPTION_WEIGHTS, "INCEPTION_NPZ") == ""
    assert weights_cache_tag(None, "INCEPTION_NPZ") == ""
    monkeypatch.setenv("INCEPTION_NPZ", _STOCK_INCEPTION_WEIGHTS)
    assert weights_cache_tag(None, "INCEPTION_NPZ") == ""
    # ANY other effective path is tagged — even with no env override in
    # sight (Evaluator(inception_weights=...) must not read/write the
    # untagged stock cache entry)
    monkeypatch.delenv("INCEPTION_NPZ", raising=False)
    t0 = weights_cache_tag("/x/fid_inception_v3.npz", "INCEPTION_NPZ")
    assert t0 and t0.startswith("_fid_inception_v3-")
    # tag is path-derived, stable, and distinct per path
    monkeypatch.setenv("INCEPTION_NPZ", "/tmp/a/weights.npz")
    t1 = weights_cache_tag("/tmp/a/weights.npz", "INCEPTION_NPZ")
    t2 = weights_cache_tag("/tmp/b/weights.npz", "INCEPTION_NPZ")
    assert t1 and t2 and t1 != t2
    assert t1 == weights_cache_tag("/tmp/a/weights.npz", "INCEPTION_NPZ")
    assert t1.startswith("_weights-")
    # env var alone (no explicit path argument) also resolves to the override
    assert weights_cache_tag(None, "INCEPTION_NPZ") == t1


def test_fid_stats_split_per_dataset():
    from ddpm_tpu.data import fid_stats_split

    assert fid_stats_split("cifar10") == "train"
    assert fid_stats_split("mnist") == "train"
    assert fid_stats_split("celeba") == "all"
    assert fid_stats_split("celebahq") == "all"
    # Blobs: target statistics come from a fresh test draw, disjoint from
    # the training stream (datasets.py Blobs.fid_split)
    assert fid_stats_split("blobs") == "test"
