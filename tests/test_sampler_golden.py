"""Trajectory parity of the vendored-sampler reimplementations against the
ACTUAL reference torch code (VERDICT r2 item 5: the 2.4 partials).

Both sides drive the same analytic eps model (no neural net — the samplers
only see eps(x, t, c), so this checks every coefficient, time grid, order
switch and CFG wiring exactly):

- PLMSSampler (plms.py:11-243) vs samplers_extra.plms_sample
- DPMSolverSampler (dpm_solver/sampler.py + dpm_solver.py multistep
  predict_x0 order-2 'time_uniform') vs samplers_extra.dpm_solver_pp_2m_sample
"""

from __future__ import annotations

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "ldm")), reason="reference checkout absent"
)

from leftrefill_tpu.diffusion.core import Conditioning
from leftrefill_tpu.diffusion.samplers_extra import (
    dpm_solver_pp_2m_sample,
    plms_sample,
)
from leftrefill_tpu.diffusion.schedules import DiffusionSchedule

SD2 = dict(linear_start=0.00085, linear_end=0.0120)
SHAPE = (2, 4, 8, 8)  # same 4-D shape both sides; the update math is elementwise


def _analytic_eps_np(x, t, c):
    """eps(x, t, c): nonlinear in x, t-dependent, conditioned — enough to
    distinguish any coefficient/time-grid deviation."""
    return 0.3 * np.tanh(x) * (0.5 + t.reshape(-1, 1, 1, 1) / 2000.0) + 0.05 * c


@pytest.fixture(scope="module")
def ref_mod():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # stubs as in test_golden_parity (only unused paths need them)
    for name in ("torchvision", "torchvision.utils", "torchvision.transforms"):
        sys.modules.setdefault(name, types.ModuleType(name))
    import ldm.models.diffusion.dpm_solver.sampler as dpm_sampler
    import ldm.models.diffusion.plms as plms

    return types.SimpleNamespace(plms=plms, dpm_sampler=dpm_sampler)


@pytest.fixture(scope="module")
def sched():
    return DiffusionSchedule.create(timesteps=1000, beta_schedule="linear", **SD2)


class _TorchFakeLDM:
    """The attribute surface PLMSSampler/DPMSolverSampler read from the LDM."""

    parameterization = "eps"

    def __init__(self, sched):
        self.num_timesteps = sched.num_timesteps
        self.device = torch.device("cpu")
        self.betas = torch.tensor(np.asarray(sched.betas), dtype=torch.float32)
        self.alphas_cumprod = torch.tensor(
            np.asarray(sched.alphas_cumprod), dtype=torch.float32
        )
        self.alphas_cumprod_prev = torch.tensor(
            np.asarray(sched.alphas_cumprod_prev), dtype=torch.float32
        )
        self.sqrt_one_minus_alphas_cumprod = torch.sqrt(1.0 - self.alphas_cumprod)

    def apply_model(self, x, t, c):
        e = _analytic_eps_np(
            x.numpy().astype(np.float64),
            t.numpy().astype(np.float64),
            c.numpy().astype(np.float64),
        )
        return torch.tensor(e, dtype=torch.float32)


class _JaxFakeModel:
    parameterization = "eps"

    def __init__(self, sched):
        self.schedule = sched


def _jax_apply_fn(x, t, c):
    return 0.3 * jnp.tanh(x) * (
        0.5 + t.astype(jnp.float32).reshape(-1, 1, 1, 1) / 2000.0
    ) + 0.05 * c.c_crossattn.reshape(-1, 1, 1, 1)


def _x_T():
    return np.random.RandomState(0).randn(*SHAPE).astype(np.float32)


def _no_cuda(sampler_cls):
    """Reference samplers force-move buffers to CUDA; keep them on CPU."""

    class Patched(sampler_cls):
        def register_buffer(self, name, attr):
            setattr(self, name, attr)

    return Patched


@pytest.mark.parametrize("cfg", [1.0, 2.5])
def test_plms_trajectory_parity(ref_mod, sched, cfg):
    x_T = _x_T()
    cond_v, uncond_v = 3.0, 1.0
    b = SHAPE[0]

    tm = _TorchFakeLDM(sched)
    sampler = _no_cuda(ref_mod.plms.PLMSSampler)(tm)
    c_t = torch.full((b, 1, 1, 1), cond_v)
    uc_t = torch.full((b, 1, 1, 1), uncond_v)
    ref_out, _ = sampler.sample(
        S=10,
        batch_size=b,
        shape=SHAPE[1:],
        conditioning=c_t,
        x_T=torch.tensor(x_T),
        verbose=False,
        unconditional_guidance_scale=cfg,
        unconditional_conditioning=uc_t if cfg != 1.0 else None,
    )

    jm = _JaxFakeModel(sched)
    tables = sched.ddim_tables(10, eta=0.0)
    ours = plms_sample(
        jm,
        _jax_apply_fn,
        tables,
        Conditioning(c_crossattn=jnp.full((b, 1), cond_v)),
        jax.random.PRNGKey(0),
        SHAPE,
        uncond=Conditioning(c_crossattn=jnp.full((b, 1), uncond_v)) if cfg != 1.0 else None,
        guidance_scale=cfg,
        x_T=jnp.asarray(x_T),
    )
    d = np.abs(np.asarray(ours) - ref_out.numpy()).max()
    assert d < 5e-5, f"PLMS trajectory diverges: max|diff|={d:.2e}"


@pytest.mark.parametrize("steps,cfg", [(8, 2.5), (15, 2.5), (20, 1.0), (20, 2.5)])
def test_dpm_solver_pp_2m_trajectory_parity(ref_mod, sched, steps, cfg):
    """Covers lower_order_final (steps<15), the >=15 branch, the 20-step
    serving config, and a non-divisor-of-1000 count (15: the DDIM table
    build rounds it to 16, so the explicit num_steps override must win)."""
    x_T = _x_T()
    cond_v, uncond_v = 2.0, 0.5
    b = SHAPE[0]

    tm = _TorchFakeLDM(sched)
    sampler = _no_cuda(ref_mod.dpm_sampler.DPMSolverSampler)(tm)
    c_t = torch.full((b, 1, 1, 1), cond_v)
    uc_t = torch.full((b, 1, 1, 1), uncond_v)
    ref_out, _ = sampler.sample(
        S=steps,
        batch_size=b,
        shape=SHAPE[1:],
        conditioning=c_t,
        x_T=torch.tensor(x_T),
        verbose=False,
        unconditional_guidance_scale=cfg,
        unconditional_conditioning=uc_t,
    )

    jm = _JaxFakeModel(sched)
    # the DDIM tables supply only a default step count (and round 15 -> 16,
    # a non-divisor of 1000) — num_steps pins the exact requested count
    tables = sched.ddim_tables(steps, eta=0.0)
    ours = dpm_solver_pp_2m_sample(
        jm,
        _jax_apply_fn,
        tables,
        Conditioning(c_crossattn=jnp.full((b, 1), cond_v)),
        jax.random.PRNGKey(0),
        SHAPE,
        uncond=Conditioning(c_crossattn=jnp.full((b, 1), uncond_v)),
        guidance_scale=cfg,
        x_T=jnp.asarray(x_T),
        num_steps=steps,
    )
    d = np.abs(np.asarray(ours) - ref_out.numpy()).max()
    assert d < 1e-4, f"DPM-Solver++(2M) trajectory diverges: max|diff|={d:.2e}"
