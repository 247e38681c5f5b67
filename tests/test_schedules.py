"""Golden-value tests for schedules vs closed-form reference formulas
(reference: ldm/modules/diffusionmodules/util.py:21-74)."""

import numpy as np

from leftrefill_tpu.diffusion.schedules import (
    DiffusionSchedule,
    make_beta_schedule,
    make_ddim_sampling_parameters,
    make_ddim_timesteps,
)

SD2 = dict(linear_start=0.00085, linear_end=0.0120)  # configs/ref_inpainting.yaml:4-5


def test_linear_betas_endpoints():
    betas = make_beta_schedule("linear", 1000, **SD2)
    assert betas.dtype == np.float64
    assert np.isclose(betas[0], 0.00085)
    assert np.isclose(betas[-1], 0.0120)
    # squared-sqrt-linspace: sqrt(betas) must be affine in the index
    s = np.sqrt(betas)
    d = np.diff(s)
    assert np.allclose(d, d[0])


def test_ddim_timesteps_uniform_offset():
    ts = make_ddim_timesteps("uniform", 50, 1000)
    assert ts.shape == (50,)
    assert ts[0] == 1  # the reference's +1 offset (util.py:57)
    assert ts[1] == 21
    assert ts[-1] == 981


def test_ddim_sampling_parameters_eta1():
    betas = make_beta_schedule("linear", 1000, **SD2)
    ac = np.cumprod(1 - betas)
    ts = make_ddim_timesteps("uniform", 50, 1000)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(ac, ts, eta=1.0)
    assert alphas.shape == (50,)
    # alphas_prev[0] is alphacums[0] (util.py:66)
    assert np.isclose(alphas_prev[0], ac[0])
    assert np.all(alphas_prev >= alphas)  # alpha_bar decreasing in t
    expected0 = np.sqrt((1 - alphas_prev[0]) / (1 - alphas[0]) * (1 - alphas[0] / alphas_prev[0]))
    assert np.isclose(sigmas[0], expected0)
    # eta=0 => deterministic DDIM
    sig0, _, _ = make_ddim_sampling_parameters(ac, ts, eta=0.0)
    assert np.all(sig0 == 0)


def test_schedule_buffers_consistency():
    sch = DiffusionSchedule.create(timesteps=1000, beta_schedule="linear", **SD2)
    assert sch.num_timesteps == 1000
    assert np.allclose(
        sch.sqrt_alphas_cumprod**2 + sch.sqrt_one_minus_alphas_cumprod**2,
        1.0,
        atol=1e-5,
    )
    # eps lvlb weights: betas^2 / (2 * post_var * alpha * (1 - abar)); first entry patched
    assert np.isfinite(sch.lvlb_weights).all()
    assert sch.lvlb_weights[0] == sch.lvlb_weights[1]
    # posterior mean coefs sum: c1*sqrt(abar_prev-ish) sanity — just check shapes/finiteness
    assert sch.posterior_variance.shape == (1000,)
    assert (sch.posterior_variance >= 0).all()


def test_ddim_tables_roundtrip():
    sch = DiffusionSchedule.create(timesteps=1000, beta_schedule="linear", **SD2)
    tabs = sch.ddim_tables(50, eta=1.0)
    assert tabs.num_steps == 50
    assert np.allclose(tabs.alphas, sch.alphas_cumprod[tabs.timesteps], atol=1e-7)
    assert np.allclose(tabs.sqrt_one_minus_alphas, np.sqrt(1 - tabs.alphas), atol=1e-7)
