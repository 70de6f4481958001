"""Golden-value pins generated from the reference torch implementation.

Every constant below was produced by ``scripts/check_diffusion_parity.py
--golden``, which asserts our f64 tables/VLB equal the *actual* reference
torch code (/root/reference: ddpm_torch/diffusion.py + ddim.py) to ~1e-13.
These tests re-check the same quantities at CI speed with no torch import,
so a regression in the schedule/likelihood math is caught even where the
formula/self-consistency tests wouldn't notice a shared-formula drift.
"""

import jax.numpy as jnp
import numpy as np

from ddpm_tpu.diffusion import GaussianDiffusion, get_selection_schedule
from ddpm_tpu.math import schedules as sched


def test_ddim_table_pins_eta_half():
    """DDIM quad-10 subsequence, eta=0.5, T=100 linear betas — table entries
    match the reference DDIM constructor (ddim.py:61-92) per the oracle."""
    betas = sched.get_beta_schedule("linear", 1e-4, 0.02, 100)
    sub = get_selection_schedule("quadratic", 10, 100)
    assert sub.tolist() == [0, 1, 4, 9, 16, 25, 36, 48, 63, 80]
    c = sched.compute_ddim_coefficients(betas, "fixed-small", 0.5, sub)
    idx = [0, 3, 7, 9]
    np.testing.assert_allclose(
        np.asarray(c.posterior_var, np.float64)[idx],
        [0.0, 0.0004709310466188, 0.01481849630016679, 0.03857460417806717],
        rtol=1e-12,
        atol=1e-18,
    )
    np.testing.assert_allclose(
        np.asarray(c.posterior_mean_coef1, np.float64)[idx],
        [1.0, 0.5497337755852985, 0.28819920316637093, 0.24846210310310468],
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(c.posterior_mean_coef2, np.float64)[idx],
        [0.0, 0.4512739972950852, 0.7281822591872644, 0.7867852542456137],
        rtol=1e-12,
        atol=1e-18,
    )


def _denoise(var_type):
    # identical to scripts/check_diffusion_parity.py::_jax_denoise — the fn
    # the golden VLB values were generated with
    def fn(x, t):
        ts = (t.astype(x.dtype) / 1000.0).reshape((-1,) + (1,) * (x.ndim - 1))
        out = 0.2 * x + 0.1 * jnp.cos(7.0 * ts)
        if var_type == "learned":
            out = jnp.concatenate([out, 0.05 * x - 0.3 - ts], axis=-1)
        return out

    return fn


# golden f64 totals from the oracle run (check_diffusion_parity.py --golden);
# CI evaluates in f32, hence the 1e-4 relative tolerance (measured f32-vs-f64
# drift is <2e-6 for these eps-path cases)
_VLB_GOLDEN = {
    "fixed-small": (
        [10.534490352232723, 10.661537569407729, 10.584252552125712, 10.903601065875907],
        2.220734671065724,  # L[0, t=0]
        0.025008877630492497,  # L[0, t=50]
    ),
    "fixed-large": (
        [8.339919425065663, 8.660303821879351, 8.589464925842336, 8.74353494748678],
        2.220734671065724,
        0.024585301120274718,
    ),
    "learned": (
        [266.54072139218704, 266.3398326990724, 266.33980493284645, 266.34772176598364],
        8.106553179032032,
        2.3744282343656535,
    ),
}

_PRIOR_GOLDEN = [0.15939619066400243, 0.15337056670949725, 0.1404377863009277, 0.1503092116819425]


def _vlb_case(var_type):
    T, B, hw = 100, 4, 8
    betas = sched.get_beta_schedule("linear", 1e-4, 0.02, T)
    ours = GaussianDiffusion.create(betas, "eps", var_type, "kl")
    fn = _denoise(var_type)
    rng = np.random.default_rng(0)
    x0 = rng.uniform(-1.0, 1.0, (B, 3, hw, hw))
    noise_all = rng.standard_normal((T, B, 3, hw, hw))
    x0_j = jnp.asarray(np.moveaxis(x0, 1, -1), jnp.float32)
    losses = np.zeros((B, T))
    for ti in range(T):
        tj = jnp.full((B,), ti, jnp.int32)
        x_t = ours.q_sample(x0_j, tj, noise=jnp.asarray(np.moveaxis(noise_all[ti], 1, -1)))
        losses[:, ti] = np.asarray(
            ours._loss_term_bpd(fn, x0_j, x_t=x_t, t=tj, clip_denoised=True)
        )
    prior = np.asarray(ours._prior_bpd(x0_j))
    total = losses.sum(1) + prior
    return total, losses, prior


def test_vlb_pins_fixed_small():
    total, losses, prior = _vlb_case("fixed-small")
    golden_total, l0, l50 = _VLB_GOLDEN["fixed-small"]
    np.testing.assert_allclose(total, golden_total, rtol=1e-4)
    np.testing.assert_allclose(prior, _PRIOR_GOLDEN, rtol=1e-4)
    np.testing.assert_allclose(losses[0, 0], l0, rtol=1e-4)
    np.testing.assert_allclose(losses[0, 50], l50, rtol=1e-3)


def test_vlb_pins_fixed_large():
    total, losses, prior = _vlb_case("fixed-large")
    golden_total, l0, l50 = _VLB_GOLDEN["fixed-large"]
    np.testing.assert_allclose(total, golden_total, rtol=1e-4)
    np.testing.assert_allclose(losses[0, 0], l0, rtol=1e-4)
    np.testing.assert_allclose(losses[0, 50], l50, rtol=1e-3)


def test_vlb_pins_learned():
    """Learned-variance VLB against the oracle goldens. NOTE: the reference
    itself cannot run this path (its constructor KeyErrors on "learned" at
    diffusion.py:70-73 and p_mean_var's `assert all(bool)` at :112 raises
    TypeError); the goldens come from composing the reference's own
    primitives — see check_diffusion_parity.py::_ref_learned_loss_term."""
    total, losses, prior = _vlb_case("learned")
    golden_total, l0, l50 = _VLB_GOLDEN["learned"]
    np.testing.assert_allclose(total, golden_total, rtol=1e-4)
    np.testing.assert_allclose(losses[0, 0], l0, rtol=1e-4)
    np.testing.assert_allclose(losses[0, 50], l50, rtol=1e-3)
