"""GaussianDiffusion process tests: forward/reverse math, losses, samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_tpu.diffusion import (
    GaussianDiffusion,
    ddim_from_betas,
    ddim_from_ddpm,
    get_selection_schedule,
)
from ddpm_tpu.math.schedules import get_beta_schedule

T = 100  # small T keeps the scan tests fast
SHAPE = (4, 8, 8, 3)


@pytest.fixture(scope="module")
def betas():
    return get_beta_schedule("linear", 1e-4, 0.02, T)


@pytest.fixture(scope="module")
def diff(betas):
    return GaussianDiffusion.create(betas, "eps", "fixed-large", "mse")


def test_q_sample_roundtrip(diff):
    """pred_x_0_from_eps inverts q_sample exactly."""
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, SHAPE, minval=-1, maxval=1)
    eps = jax.random.normal(jax.random.fold_in(key, 1), SHAPE)
    t = jnp.array([0, 10, 50, T - 1], dtype=jnp.int32)
    x_t = diff.q_sample(x0, t, noise=eps)
    x0_rec = diff._pred_x_0_from_eps(x_t, eps, t)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)


def test_q_mean_var_t0_near_identity(diff):
    x0 = jnp.ones(SHAPE)
    t = jnp.zeros((4,), dtype=jnp.int32)
    mean, var, _ = diff.q_mean_var(x0, t)
    np.testing.assert_allclose(np.asarray(mean), np.sqrt(1 - 1e-4), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var), 1e-4, rtol=1e-3)


@pytest.mark.parametrize("mean_type", ["mean", "x_0", "eps"])
def test_p_mean_var_mean_types(betas, mean_type):
    d = GaussianDiffusion.create(betas, mean_type, "fixed-small", "mse")
    key = jax.random.PRNGKey(2)
    x_t = jax.random.normal(key, SHAPE)
    t = jnp.full((4,), 7, dtype=jnp.int32)
    fn = lambda x, tt: 0.1 * x
    mean, var, logvar, pred = d.p_mean_var(fn, x_t, t, clip_denoised=True)
    for o in (mean, var, logvar, pred):
        assert o.shape[0] == 4
        assert np.isfinite(np.asarray(o)).all()
    assert (np.abs(np.asarray(pred)) <= 1.0 + 1e-6).all()


def test_learned_var_split(betas):
    d = GaussianDiffusion.create(betas, "eps", "learned", "kl")
    x_t = jnp.zeros(SHAPE)
    t = jnp.full((4,), 3, dtype=jnp.int32)
    # model emits 2C channels: eps prediction + logvar
    fn = lambda x, tt: jnp.concatenate([jnp.zeros_like(x), jnp.full_like(x, -2.0)], axis=-1)
    mean, var, logvar, pred = d.p_mean_var(fn, x_t, t, clip_denoised=False)
    assert mean.shape == SHAPE
    np.testing.assert_allclose(np.asarray(logvar), -2.0)
    np.testing.assert_allclose(np.asarray(var), np.exp(-2.0), rtol=1e-5)


def test_mse_loss_zero_for_perfect_eps_model(diff):
    key = jax.random.PRNGKey(3)
    x0 = jax.random.uniform(key, SHAPE, minval=-1, maxval=1)
    eps = jax.random.normal(jax.random.fold_in(key, 1), SHAPE)
    t = jnp.array([0, 1, 50, 99], dtype=jnp.int32)
    # oracle model that outputs exactly the noise used by q_sample
    losses = diff.train_losses(lambda x, tt: eps, x0, t, noise=eps)
    assert losses.shape == (4,)
    np.testing.assert_allclose(np.asarray(losses), 0.0, atol=1e-10)


@pytest.mark.parametrize("mean_type", ["mean", "x_0"])
def test_mse_loss_other_targets(betas, mean_type):
    d = GaussianDiffusion.create(betas, mean_type, "fixed-small", "mse")
    key = jax.random.PRNGKey(4)
    x0 = jax.random.uniform(key, SHAPE, minval=-1, maxval=1)
    eps = jax.random.normal(jax.random.fold_in(key, 1), SHAPE)
    t = jnp.array([1, 2, 3, 4], dtype=jnp.int32)
    losses = d.train_losses(lambda x, tt: jnp.zeros_like(x), x0, t, noise=eps)
    assert losses.shape == (4,)
    assert (np.asarray(losses) >= 0).all()


def test_kl_loss_finite_and_nonnegative(betas):
    d = GaussianDiffusion.create(betas, "eps", "fixed-small", "kl")
    key = jax.random.PRNGKey(5)
    x0 = jax.random.uniform(key, SHAPE, minval=-1, maxval=1)
    eps = jax.random.normal(jax.random.fold_in(key, 1), SHAPE)
    t = jnp.array([0, 1, 50, 99], dtype=jnp.int32)  # include the t=0 decoder-NLL path
    losses = d.train_losses(lambda x, tt: jnp.zeros_like(x), x0, t, noise=eps)
    arr = np.asarray(losses)
    assert np.isfinite(arr).all()
    assert arr[1:].min() >= 0  # KL terms nonnegative (t=0 NLL may be any sign in bits)


def test_p_sample_shapes_and_determinism(diff):
    fn = lambda x, tt: 0.01 * x
    key = jax.random.PRNGKey(6)
    s1 = diff.p_sample(fn, SHAPE, key)
    s2 = diff.p_sample(fn, SHAPE, key)
    assert s1.shape == SHAPE
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    s3 = diff.p_sample(fn, SHAPE, jax.random.PRNGKey(7))
    assert np.abs(np.asarray(s1) - np.asarray(s3)).max() > 1e-3


def test_p_sample_matches_python_loop(diff):
    """The lax.scan chain must equal a hand-rolled per-step Python loop."""
    fn = lambda x, tt: 0.05 * x
    key = jax.random.PRNGKey(8)
    scan_out = diff.p_sample(fn, SHAPE, key)

    init_key, step_key = jax.random.split(key)
    x = jax.random.normal(init_key, SHAPE)
    for ti in range(T - 1, -1, -1):
        t = jnp.full((4,), ti, dtype=jnp.int32)
        k = jax.random.fold_in(step_key, ti)
        x = diff.p_sample_step(fn, x, t, k)
    np.testing.assert_allclose(np.asarray(scan_out), np.asarray(x), atol=1e-5)


def test_p_sample_progressive(diff):
    fn = lambda x, tt: 0.01 * x
    x, preds = diff.p_sample_progressive(fn, SHAPE, jax.random.PRNGKey(9), pred_freq=10)
    assert x.shape == SHAPE
    assert preds.shape == (T // 10,) + SHAPE
    # every snapshot slot must have been written (non-zero with prob 1)
    assert (np.abs(np.asarray(preds)).reshape(T // 10, -1).max(axis=1) > 0).all()


def test_calc_all_bpd_shapes(diff):
    key = jax.random.PRNGKey(10)
    x0 = jax.random.uniform(key, (2, 4, 4, 3), minval=-1, maxval=1)
    total, losses, prior, mses = diff.calc_all_bpd(lambda x, tt: jnp.zeros_like(x), x0, key)
    assert total.shape == (2,)
    assert losses.shape == (2, T)
    assert prior.shape == (2,)
    assert mses.shape == (2, T)
    np.testing.assert_allclose(
        np.asarray(total), np.asarray(losses.sum(axis=1) + prior), rtol=1e-5
    )


# --------------------------------------------------------------------- #
# DDIM
# --------------------------------------------------------------------- #


def test_selection_schedules():
    lin = get_selection_schedule("linear", 10, 1000)
    np.testing.assert_array_equal(lin, np.arange(0, 1000, 100))
    quad = get_selection_schedule("quadratic", 10, 1000)
    assert quad[0] == 0 and quad[-1] == 800
    assert (np.diff(quad) > 0).all()


def test_ddim_eta0_ignores_step_noise(betas):
    """eta=0 makes each reverse step deterministic given x_T."""
    sub = get_selection_schedule("linear", 10, T)
    ddim = ddim_from_betas(betas, "eps", "fixed-small", "mse", eta=0.0, subsequence=sub)
    fn = lambda x, tt: 0.05 * x
    noise = jax.random.normal(jax.random.PRNGKey(11), SHAPE)
    s1 = ddim.p_sample(fn, SHAPE, jax.random.PRNGKey(1), noise=noise)
    s2 = ddim.p_sample(fn, SHAPE, jax.random.PRNGKey(2), noise=noise)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


def test_ddim_time_remap(betas):
    """Model must be called with original-training timesteps, not scan indices."""
    sub = get_selection_schedule("linear", 10, T)
    ddim = ddim_from_betas(betas, "eps", "fixed-small", "mse", eta=0.0, subsequence=sub)
    seen = []

    def fn(x, tt):
        seen.append(np.asarray(tt)[0])
        return jnp.zeros_like(x)

    with jax.disable_jit():
        ddim.p_sample(fn, (1, 4, 4, 3), jax.random.PRNGKey(0))
    assert sorted(set(int(s) for s in seen)) == sorted(int(s) for s in sub)


def test_ddim_from_ddpm_autoconverts_var_type(betas):
    ddpm = GaussianDiffusion.create(betas, "eps", "fixed-large", "mse")
    sub = get_selection_schedule("linear", 10, T)
    ddim = ddim_from_ddpm(ddpm, eta=0.0, subsequence=sub, betas=betas)
    assert ddim.model_var_type == "fixed-small"
    assert ddim.timesteps == 10


def test_ddim_eta1_identity_subsequence_equals_ddpm_sampling(betas):
    """Full-length eta=1 DDIM must produce the same chain as the DDPM."""
    ddpm = GaussianDiffusion.create(betas, "eps", "fixed-small", "mse")
    ddim = ddim_from_betas(
        betas, "eps", "fixed-small", "mse", eta=1.0, subsequence=np.arange(T)
    )
    fn = lambda x, tt: 0.02 * x
    key = jax.random.PRNGKey(12)
    a = ddpm.p_sample(fn, SHAPE, key)
    b = ddim.p_sample(fn, SHAPE, key)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_ddim_from_ddpm_full_precision_tables(betas):
    """from_ddpm with NO explicit betas must rebuild tables from the exact
    f64 schedule recorded at create() time — bitwise equal to ddim_from_betas
    on the original f64 betas (the reference from_ddpm signature,
    ddim.py:115-120, passes no schedule)."""
    ddpm = GaussianDiffusion.create(betas, "eps", "fixed-small", "mse")
    assert ddpm.betas_f64 is not None
    np.testing.assert_array_equal(
        np.asarray(ddpm.betas_f64, np.float64), np.asarray(betas, np.float64)
    )
    sub = get_selection_schedule("quadratic", 10, T)
    via_ddpm = ddim_from_ddpm(ddpm, eta=0.5, subsequence=sub)
    via_betas = ddim_from_betas(betas, "eps", "fixed-small", "mse", eta=0.5, subsequence=sub)
    from ddpm_tpu.diffusion.gaussian import _TABLE_FIELDS

    for f in _TABLE_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(via_ddpm, f)),
            np.asarray(getattr(via_betas, f)),
            err_msg=f,
        )


def test_diffusion_with_betas_f64_jits(betas):
    """The static betas_f64 tuple must not break jit treedef hashing."""
    d = GaussianDiffusion.create(betas, "eps", "fixed-small", "mse")

    @jax.jit
    def f(diff, x, t):
        return diff.q_sample(x, t, jnp.zeros_like(x))

    x = jnp.ones(SHAPE)
    t = jnp.zeros((SHAPE[0],), jnp.int32)
    out = f(d, x, t)
    assert out.shape == SHAPE


def test_learned_head_through_fixed_variance_sampler(betas):
    """A learned-variance (2C-head) model sampled through a fixed-variance
    process: p_mean_var slices the eps half shape-wise (the Improved-DDPM
    strided-sampling convention), so DDIM eta<1 (force-converted to
    fixed-small, ddim.py:58-60) and any other fixed-var caller —
    progressive chains, bpd — just work with the 2C denoise_fn."""
    sub = get_selection_schedule("linear", 10, T)
    ddim = ddim_from_betas(betas, "eps", "learned", "kl", eta=0.0, subsequence=sub)
    assert ddim.model_var_type == "fixed-small"  # auto-converted

    def denoise(x, t):
        # [eps-hat | logvar] on the channel axis
        return jnp.concatenate([0.1 * x, jnp.zeros_like(x) - 2.0], axis=-1)

    out = ddim.p_sample(denoise, SHAPE, jax.random.PRNGKey(3))
    assert out.shape == SHAPE
    assert np.isfinite(np.asarray(out)).all()

    # the slice must equal sampling the C-channel eps model directly
    eps_only = lambda x, t: 0.1 * x
    out2 = ddim.p_sample(eps_only, SHAPE, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    # progressive chain through the same head
    x0, preds = ddim.p_sample_progressive(
        denoise, SHAPE, jax.random.PRNGKey(4), pred_freq=5
    )
    assert x0.shape == SHAPE and np.isfinite(np.asarray(preds)).all()


def test_hybrid_loss_gradient_split(betas):
    """The hybrid objective's division of labor (Improved-DDPM §3.2): the
    mse term alone trains the mean-param half; the stop-grad-mean VLB term
    alone trains the logvar half. Pure kl starves the mean (measured 1e4x
    gradient imbalance — the round-5 motivation for the extension), so pin:
    (a) hybrid == mse + lambda*vlb(frozen mean) by value;
    (b) the mean-half gradient equals the PURE-mse mean gradient (the vlb
        term contributes exactly zero to it, thanks to the stop-gradient);
    (c) the logvar half receives a nonzero gradient (pure mse gives it none).
    """
    from ddpm_tpu.diffusion.gaussian import HYBRID_LAMBDA

    d = GaussianDiffusion.create(betas, "eps", "learned", "hybrid")
    key = jax.random.PRNGKey(11)
    x0 = jax.random.uniform(key, SHAPE, minval=-1, maxval=1)
    eps = jax.random.normal(jax.random.fold_in(key, 1), SHAPE)
    t = jnp.array([0, 1, 50, 99], dtype=jnp.int32)

    # 2C linear "model": out = concat(A*x + eps_bias, logvar_bias)
    def make_fn(params):
        def fn(x, tt):
            return jnp.concatenate(
                [params["a"] * x + params["b"], jnp.zeros_like(x) + params["c"]],
                axis=-1,
            )
        return fn

    params = {"a": jnp.float32(0.1), "b": jnp.float32(0.05), "c": jnp.float32(-1.0)}

    def hybrid_loss(p):
        return jnp.mean(d.train_losses(make_fn(p), x0, t, noise=eps))

    val, g = jax.value_and_grad(hybrid_loss)(params)
    assert np.isfinite(float(val))
    # (c) logvar half trains
    assert abs(float(g["c"])) > 1e-6

    # (a) value decomposition against hand-built mse + frozen-mean vlb
    d_kl = GaussianDiffusion.create(betas, "eps", "learned", "kl")
    x_t = d.q_sample(x0, t, noise=eps)
    mse = jnp.mean(
        jnp.mean(
            jnp.square(eps - (params["a"] * x_t + params["b"])).reshape(4, -1), axis=1
        )
    )
    vlb = jnp.mean(
        d_kl._loss_term_bpd(make_fn(params), x0, x_t, t, clip_denoised=False)
    )
    np.testing.assert_allclose(
        float(val), float(mse + HYBRID_LAMBDA * vlb), rtol=1e-5
    )

    # (b) mean-half gradient is exactly the pure-mse gradient
    def pure_mse(p):
        x_t_ = d.q_sample(x0, t, noise=eps)
        out = p["a"] * x_t_ + p["b"]
        return jnp.mean(jnp.mean(jnp.square(eps - out).reshape(4, -1), axis=1))

    g_mse = jax.grad(pure_mse)(params)
    np.testing.assert_allclose(float(g["a"]), float(g_mse["a"]), rtol=1e-5)
    np.testing.assert_allclose(float(g["b"]), float(g_mse["b"]), rtol=1e-5)


def test_hybrid_requires_learned_variance(betas):
    with pytest.raises(ValueError, match="hybrid"):
        GaussianDiffusion.create(betas, "eps", "fixed-small", "hybrid")
