"""Schedule and coefficient-table unit tests (f64 host math)."""

import numpy as np
import pytest

from ddpm_tpu.math.schedules import (
    compute_coefficients,
    compute_ddim_coefficients,
    get_beta_schedule,
)

T = 1000
BETA_START, BETA_END = 1e-4, 0.02


@pytest.mark.parametrize(
    "name", ["quad", "linear", "warmup10", "warmup50", "const", "jsd"]
)
def test_schedule_shapes_and_range(name):
    betas = get_beta_schedule(name, BETA_START, BETA_END, T)
    assert betas.shape == (T,)
    assert betas.dtype == np.float64
    assert (betas > 0).all() and (betas <= 1).all()


def test_linear_endpoints():
    betas = get_beta_schedule("linear", BETA_START, BETA_END, T)
    assert betas[0] == pytest.approx(BETA_START)
    assert betas[-1] == pytest.approx(BETA_END)


def test_quad_is_squared_sqrt_space():
    betas = get_beta_schedule("quad", BETA_START, BETA_END, T)
    sqrt_lin = np.linspace(BETA_START**0.5, BETA_END**0.5, T)
    np.testing.assert_allclose(betas, sqrt_lin**2, rtol=1e-12)


def test_warmup_schedules():
    for name, frac in [("warmup10", 0.1), ("warmup50", 0.5)]:
        betas = get_beta_schedule(name, BETA_START, BETA_END, T)
        w = int(T * frac)
        assert (betas[w:] == BETA_END).all()
        assert betas[0] == pytest.approx(BETA_START)
        assert betas[w - 1] == pytest.approx(BETA_END)


def test_jsd_schedule():
    betas = get_beta_schedule("jsd", BETA_START, BETA_END, T)
    assert betas[0] == pytest.approx(1.0 / T)
    assert betas[-1] == pytest.approx(1.0)


@pytest.fixture(scope="module")
def coefs():
    betas = get_beta_schedule("linear", BETA_START, BETA_END, T)
    return compute_coefficients(betas, "fixed-large")


def test_alphas_bar_monotone(coefs):
    assert (np.diff(coefs.alphas_bar) < 0).all()
    assert 0 < coefs.alphas_bar[-1] < coefs.alphas_bar[0] < 1


def test_qsample_coef_identity(coefs):
    # a-bar + (1 - a-bar) = 1, via the sqrt tables
    np.testing.assert_allclose(
        coefs.sqrt_alphas_bar**2 + coefs.sqrt_one_minus_alphas_bar**2,
        np.ones(T),
        rtol=1e-12,
    )


def test_posterior_mean_fixed_point(coefs):
    # if x_t = sqrt(a-bar)*x_0 exactly, E[x_{t-1}|x_t,x_0] = sqrt(a-bar-prev)*x_0
    lhs = coefs.posterior_mean_coef1 + coefs.posterior_mean_coef2 * coefs.sqrt_alphas_bar
    np.testing.assert_allclose(lhs, np.sqrt(coefs.alphas_bar_prev), rtol=1e-10)


def test_posterior_var_formula(coefs):
    betas = coefs.betas
    expected = betas * (1 - coefs.alphas_bar_prev) / (1 - coefs.alphas_bar)
    np.testing.assert_allclose(coefs.posterior_var, expected, rtol=1e-12)
    assert coefs.posterior_var[0] == 0.0


def test_index0_logvar_patch(coefs):
    # posterior_logvar at index 0 is substituted with log(posterior_var[1])
    assert coefs.posterior_logvar_clipped[0] == pytest.approx(
        np.log(coefs.posterior_var[1])
    )
    # fixed-large logvar table: index 0 patched, rest = log(betas)
    assert coefs.fixed_model_logvar[0] == pytest.approx(np.log(coefs.posterior_var[1]))
    np.testing.assert_allclose(coefs.fixed_model_logvar[1:], np.log(coefs.betas[1:]))
    np.testing.assert_allclose(coefs.fixed_model_var, coefs.betas)


def test_fixed_small_tables():
    betas = get_beta_schedule("linear", BETA_START, BETA_END, T)
    c = compute_coefficients(betas, "fixed-small")
    np.testing.assert_allclose(c.fixed_model_var, c.posterior_var)
    np.testing.assert_allclose(c.fixed_model_logvar, c.posterior_logvar_clipped)


def test_recip_tables(coefs):
    np.testing.assert_allclose(
        coefs.sqrt_recip_alphas_bar, 1.0 / np.sqrt(coefs.alphas_bar), rtol=1e-12
    )
    np.testing.assert_allclose(
        coefs.sqrt_recip_m1_alphas_bar,
        np.sqrt(1.0 / coefs.alphas_bar - 1.0),
        rtol=1e-12,
    )


def test_ddim_eta1_full_subsequence_matches_ddpm():
    """eta=1 on the identity subsequence must reproduce the DDPM posterior."""
    betas = get_beta_schedule("linear", BETA_START, BETA_END, T)
    ddpm = compute_coefficients(betas, "fixed-small")
    ddim = compute_ddim_coefficients(betas, "fixed-small", 1.0, np.arange(T))
    np.testing.assert_allclose(ddim.alphas_bar, ddpm.alphas_bar, rtol=1e-10)
    np.testing.assert_allclose(ddim.posterior_var, ddpm.posterior_var, atol=1e-12)
    np.testing.assert_allclose(
        ddim.posterior_mean_coef1, ddpm.posterior_mean_coef1, rtol=1e-7, atol=1e-12
    )
    np.testing.assert_allclose(
        ddim.posterior_mean_coef2, ddpm.posterior_mean_coef2, rtol=1e-7, atol=1e-12
    )


def test_ddim_eta0_zero_variance():
    betas = get_beta_schedule("linear", BETA_START, BETA_END, T)
    sub = np.arange(0, T, 20)
    ddim = compute_ddim_coefficients(betas, "fixed-small", 0.0, sub)
    assert (ddim.posterior_var == 0).all()
    # x0-fixed-point identity holds for the generalized coefficients too
    lhs = ddim.posterior_mean_coef1 + ddim.posterior_mean_coef2 * ddim.sqrt_alphas_bar
    np.testing.assert_allclose(lhs, np.sqrt(ddim.alphas_bar_prev), rtol=1e-9)
