"""Additional samplers: full DDPM ancestral loop, PLMS, DPM-Solver++(2M).

Behavioural reference:
- DDPM p_sample_loop (posterior mean + noise):
  /root/reference/ldm/models/diffusion/ddpm.py:999-1104 (used by sample_log
  when ddim=False, :1124-1136)
- PLMSSampler: /root/reference/ldm/models/diffusion/plms.py:11-243 (vendored;
  pseudo-linear multistep: improved-Euler first step, then Adams-Bashforth
  2nd/3rd/4th order eps combinations with the eta=0 DDIM update)
- DPMSolverSampler: /root/reference/ldm/models/diffusion/dpm_solver/ (vendored
  fast ODE solver).  Here: DPM-Solver++(2M) on the data prediction, the
  standard production configuration — same quality at ~20 steps, a legitimate
  serving speedup over 50-step DDIM.

All loops are lax.scan with batched CFG, mirroring diffusion/ddim.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from leftrefill_tpu.diffusion.core import Conditioning, LeftRefillModel
from leftrefill_tpu.diffusion.ddim import ApplyFn, _guided_eps, _scan_tables
from leftrefill_tpu.diffusion.schedules import DDIMTables


def ddpm_sample(
    model: LeftRefillModel,
    apply_fn: ApplyFn,
    cond: Conditioning,
    key: jax.Array,
    shape: tuple[int, ...],
    uncond: Optional[Conditioning] = None,
    guidance_scale: float = 1.0,
    x_T: Optional[jax.Array] = None,
    clip_denoised: bool = False,
    temperature: float = 1.0,
    return_x0_every: Optional[int] = None,
):
    """Full-schedule ancestral sampling (p_sample_loop, ddpm.py:999-1062):
    x_{t-1} = posterior_mean(x0_pred, x_t) + exp(0.5 log_var) * noise,
    no noise at t=0.

    ``return_x0_every=k``: additionally collect the x0 partial prediction
    every k steps (progressive_denoising's intermediates, ddpm.py:1065-1104)
    and return ``(img, x0s [n/k, *shape])``.  Implemented as a chunked
    double-scan so only n/k intermediates are ever materialized."""
    s = model.schedule
    n = s.num_timesteps
    b = shape[0]
    key, init_key = jax.random.split(key)
    img = x_T if x_T is not None else jax.random.normal(init_key, shape, dtype=jnp.float32)

    tabs = {
        "t": jnp.arange(n - 1, -1, -1, dtype=jnp.int32),
        "sqrt_recip": jnp.asarray(s.sqrt_recip_alphas_cumprod)[::-1],
        "sqrt_recipm1": jnp.asarray(s.sqrt_recipm1_alphas_cumprod)[::-1],
        "c1": jnp.asarray(s.posterior_mean_coef1)[::-1],
        "c2": jnp.asarray(s.posterior_mean_coef2)[::-1],
        "logvar": jnp.asarray(s.posterior_log_variance_clipped)[::-1],
    }

    def body(img, step):
        t = jnp.full((b,), step["t"], dtype=jnp.int32)
        out = _guided_eps(model, apply_fn, img, t, cond, uncond if guidance_scale != 1.0 else None, guidance_scale)
        if model.parameterization == "v":
            x0 = model.predict_start_from_z_and_v(img, t, out)
        else:
            x0 = step["sqrt_recip"] * img - step["sqrt_recipm1"] * out
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        mean = step["c1"] * x0 + step["c2"] * img
        nk = jax.random.fold_in(key, step["t"])
        noise = jax.random.normal(nk, img.shape, img.dtype) * temperature
        nonzero = (step["t"] > 0).astype(img.dtype)
        img = mean + nonzero * jnp.exp(0.5 * step["logvar"]) * noise
        return img, x0

    if return_x0_every is None:
        img, _ = jax.lax.scan(lambda c, s: (body(c, s)[0], None), img, tabs)
        return img

    k = return_x0_every
    assert n % k == 0, f"return_x0_every={k} must divide num_timesteps={n}"
    chunked = {name: v.reshape(n // k, k, *v.shape[1:]) for name, v in tabs.items()}

    def inner(carry, step):
        img, _ = carry
        img2, x0 = body(img, step)
        return (img2, x0), None

    def outer(img, chunk):
        (img, x0_last), _ = jax.lax.scan(inner, (img, jnp.zeros_like(img)), chunk)
        return img, x0_last  # x0 partial at the end of each k-step chunk

    img, x0_stack = jax.lax.scan(outer, img, chunked)
    return img, x0_stack


def _ddim_x_prev(x, e_t, a_t, a_prev):
    """eta=0 DDIM update used by PLMS (plms.py's p_sample_plms inner)."""
    pred_x0 = (x - jnp.sqrt(1.0 - a_t) * e_t) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(1.0 - a_prev) * e_t
    return jnp.sqrt(a_prev) * pred_x0 + dir_xt


def plms_sample(
    model: LeftRefillModel,
    apply_fn: ApplyFn,
    tables: DDIMTables,
    cond: Conditioning,
    key: jax.Array,
    shape: tuple[int, ...],
    uncond: Optional[Conditioning] = None,
    guidance_scale: float = 1.0,
    x_T: Optional[jax.Array] = None,
) -> jax.Array:
    """PLMS (plms.py:11-243): Adams-Bashforth multistep on eps.
    Step 0 uses the improved-Euler (Heun) corrector; later steps use
    2nd/3rd/4th-order eps combinations with the eta=0 DDIM update."""
    assert model.parameterization != "v", "PLMS operates on eps predictions"
    uncond_ = uncond if (uncond is not None and guidance_scale != 1.0) else None
    tabs = _scan_tables(tables)
    n = tables.num_steps
    b = shape[0]
    key, init_key = jax.random.split(key)
    x = x_T if x_T is not None else jax.random.normal(init_key, shape, dtype=jnp.float32)

    ts = [int(v) for v in tabs["t"]]
    a = [float(v) for v in tabs["a_t"]]
    a_prev = [float(v) for v in tabs["a_prev"]]

    # ---- step 0: improved Euler (two model calls), unrolled
    t0 = jnp.full((b,), ts[0], dtype=jnp.int32)
    e_t = _guided_eps(model, apply_fn, x, t0, cond, uncond_, guidance_scale)
    x_prev0 = _ddim_x_prev(x, e_t, a[0], a_prev[0])
    t_next = jnp.full((b,), ts[1] if n > 1 else 0, dtype=jnp.int32)
    e_t_next = _guided_eps(model, apply_fn, x_prev0, t_next, cond, uncond_, guidance_scale)
    e_prime = (e_t + e_t_next) / 2
    x = _ddim_x_prev(x, e_prime, a[0], a_prev[0])
    hist = jnp.stack([e_t, e_t, e_t])  # [3, ...] most-recent-first

    if n == 1:
        return x

    scan_tabs = {
        "t": jnp.asarray(ts[1:], jnp.int32),
        "a_t": jnp.asarray(a[1:], jnp.float32),
        "a_prev": jnp.asarray(a_prev[1:], jnp.float32),
        "i": jnp.arange(1, n, dtype=jnp.int32),
    }

    def body(carry, step):
        x, hist = carry
        t = jnp.full((b,), step["t"], dtype=jnp.int32)
        e_t = _guided_eps(model, apply_fn, x, t, cond, uncond_, guidance_scale)
        o1, o2, o3 = hist[0], hist[1], hist[2]
        e2 = (3 * e_t - o1) / 2
        e3 = (23 * e_t - 16 * o1 + 5 * o2) / 12
        e4 = (55 * e_t - 59 * o1 + 37 * o2 - 9 * o3) / 24
        order = jnp.minimum(step["i"], 3)
        e_prime = jax.lax.switch(order - 1, [lambda: e2, lambda: e3, lambda: e4])
        x = _ddim_x_prev(x, e_prime, step["a_t"], step["a_prev"])
        hist = jnp.stack([e_t, hist[0], hist[1]])
        return (x, hist), None

    (x, _), _ = jax.lax.scan(body, (x, hist), scan_tabs)
    return x


def dpm_solver_pp_2m_sample(
    model: LeftRefillModel,
    apply_fn: ApplyFn,
    tables: DDIMTables,
    cond: Conditioning,
    key: jax.Array,
    shape: tuple[int, ...],
    uncond: Optional[Conditioning] = None,
    guidance_scale: float = 1.0,
    x_T: Optional[jax.Array] = None,
    num_steps: Optional[int] = None,
) -> jax.Array:
    """DPM-Solver++(2M), reference-exact (round-3 rewrite for trajectory
    parity with the vendored sampler — tested in tests/test_sampler_golden.py).

    Replicates DPMSolverSampler.sample (dpm_solver/sampler.py:82-85:
    predict_x0=True, method='multistep', order=2, skip_type='time_uniform',
    lower_order_final=True) and DPM_Solver.sample (dpm_solver.py:939-1030):

    - continuous time grid linspace(T=1, t_0=1/N, steps+1) (get_time_steps),
    - discrete noise schedule: lambda(t) by piecewise-linear interpolation of
      0.5*log(alphas_cumprod) over t_array=(i+1)/N (NoiseScheduleVP
      'discrete'), model called at t_input=(t - 1/N)*1000 — FLOAT timesteps,
    - first-order init step, second-order multistep body
      (multistep_dpm_solver_second_update, solver_type='dpmsolver':
      x = (sigma_t/sigma_s) x - alpha_t phi_1 (m0 + D1_0/2)),
    - lower_order_final: the LAST step drops to first order when steps < 15
      (dpm_solver.py:1015-1018) — at the 20-step serving config it stays
      second order.

    ``tables`` supplies only the step count (the grid is time-uniform, not
    the DDIM sub-schedule).  ``num_steps`` overrides it exactly: the DDIM
    table build rounds non-divisors of the train schedule up by one
    (make_ddim_timesteps' range stride), which would silently shift e.g. a
    requested 15-step run to 16.
    """
    uncond_ = uncond if (uncond is not None and guidance_scale != 1.0) else None
    b = shape[0]
    n_train = model.schedule.num_timesteps
    steps = num_steps if num_steps is not None else tables.num_steps
    key, init_key = jax.random.split(key)
    x = x_T if x_T is not None else jax.random.normal(init_key, shape, dtype=jnp.float32)

    # grid + schedule functions, all precomputed host-side in f64
    log_ac = 0.5 * np.log(np.asarray(model.schedule.alphas_cumprod, np.float64))
    t_array = np.arange(1, n_train + 1, dtype=np.float64) / n_train
    ts = np.linspace(1.0, 1.0 / n_train, steps + 1)
    log_alpha = np.interp(ts, t_array, log_ac)
    alpha = np.exp(log_alpha)
    sigma = np.sqrt(np.maximum(1.0 - np.exp(2.0 * log_alpha), 1e-20))
    lam = log_alpha - np.log(sigma)
    t_input = (ts - 1.0 / n_train) * 1000.0  # get_model_input_time (discrete)

    def x0_of_t(x, t, a, s):
        tvec = jnp.full((b,), t, dtype=jnp.float32)
        out = _guided_eps(model, apply_fn, x, tvec, cond, uncond_, guidance_scale)
        if model.parameterization == "v":
            # model_wrapper 'v': eps = alpha_t * v + sigma_t * x
            out = a * out + s * x
        return (x - s * out) / a

    def x0_of(x, i):
        return x0_of_t(x, np.float32(t_input[i]), np.float32(alpha[i]), np.float32(sigma[i]))

    # init: model at t_T, then a first-order step to ts[1]
    m_prev = x0_of(x, 0)
    h = lam[1] - lam[0]
    x = np.float32(sigma[1] / sigma[0]) * x - np.float32(alpha[1] * np.expm1(-h)) * m_prev

    # second-order multistep body as ONE lax.scan over precomputed per-step
    # coefficients.  (The r3 python-for unrolled `steps` copies of the 865M
    # UNet into the graph: a 39-min compile and an HBM OOM inside bench.py's
    # outer canvas scan — bench_logs_r4/bench_dpm20_r4.log.  Same math,
    # step-for-step: d1/r0 == (m_cur - m_prev) * h/(lam[i-1] - lam[i-2]).)
    last_first_order = steps < 15  # lower_order_final, dpm_solver.py:1015-1018
    hi = steps - 1 if last_first_order else steps  # scan covers steps 2..hi
    idx = np.arange(2, hi + 1)
    if len(idx):
        h_s = lam[idx] - lam[idx - 1]
        tabs = {
            "t": jnp.asarray(np.float32(t_input[idx - 1])),
            "a": jnp.asarray(np.float32(alpha[idx - 1])),
            "s": jnp.asarray(np.float32(sigma[idx - 1])),
            "c_x": jnp.asarray(np.float32(sigma[idx] / sigma[idx - 1])),
            "c_m": jnp.asarray(np.float32(alpha[idx] * np.expm1(-h_s))),
            "inv_r0": jnp.asarray(np.float32(h_s / (lam[idx - 1] - lam[idx - 2]))),
        }

        def body(carry, tb):
            x, m_prev = carry
            m_cur = x0_of_t(x, tb["t"], tb["a"], tb["s"])
            d1 = (m_cur - m_prev) * tb["inv_r0"]
            x = tb["c_x"] * x - tb["c_m"] * m_cur - 0.5 * tb["c_m"] * d1
            return (x, m_cur), None

        (x, m_prev), _ = jax.lax.scan(body, (x, m_prev), tabs)
    if last_first_order and steps >= 2:
        m_cur = x0_of(x, steps - 1)
        h = lam[steps] - lam[steps - 1]
        x = (
            np.float32(sigma[steps] / sigma[steps - 1]) * x
            - np.float32(alpha[steps] * np.expm1(-h)) * m_cur
        )
    return x
