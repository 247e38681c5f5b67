"""StructureDDIMSampler: two-phase sampling with 3-way structural guidance.

Behavioural reference: /root/reference/ldm/models/diffusion/ddim.py:474-647 —
for DDIM index >= Tm the model runs a tripled batch [uncond; cond; cond_simple]
and blends  eps = uncond + s * ((w*cond + (1-w)*cond_simple) - uncond)
(p_sample_ddim_guide, :560-607); below Tm it falls back to plain CFG-less
sampling with cond_simple (:524-555).

TPU design: the static Tm split becomes two scans (no per-step branching
inside a scan body); each phase is a uniform jitted loop.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from leftrefill_tpu.diffusion.core import Conditioning, LeftRefillModel
from leftrefill_tpu.diffusion.ddim import ApplyFn, _ddim_update, _scan_tables
from leftrefill_tpu.diffusion.schedules import DDIMTables


def _subtables(tables: DDIMTables, lo: int, hi: int) -> DDIMTables:
    s = slice(lo, hi)
    return DDIMTables(
        timesteps=tables.timesteps[s],
        alphas=tables.alphas[s],
        alphas_prev=tables.alphas_prev[s],
        sqrt_one_minus_alphas=tables.sqrt_one_minus_alphas[s],
        sigmas=tables.sigmas[s],
        eta=tables.eta,
    )


def structure_ddim_sample(
    model: LeftRefillModel,
    apply_fn: ApplyFn,
    tables: DDIMTables,
    cond: Conditioning,
    cond_simple: Conditioning,
    key: jax.Array,
    shape: tuple[int, ...],
    uncond: Optional[Conditioning] = None,
    guidance_scale: float = 1.0,
    cond_weight: float = 0.5,
    Tm: int = 0,
    x_T: Optional[jax.Array] = None,
    temperature: float = 1.0,
) -> jax.Array:
    """Sample with 3-way guidance for indices >= Tm, plain cond_simple below."""
    b = shape[0]
    key, init_key = jax.random.split(key)
    img = x_T if x_T is not None else jax.random.normal(init_key, shape, dtype=jnp.float32)

    def run_phase(img, phase_tables: DDIMTables, guided: bool, salt: int):
        if phase_tables.num_steps == 0:
            return img
        tabs = {k: jnp.asarray(v) for k, v in _scan_tables(phase_tables).items()}
        tabs["i"] = jnp.arange(phase_tables.num_steps, dtype=jnp.int32)

        def body(img, step):
            t = jnp.full((b,), step["t"], dtype=jnp.int32)
            if guided and uncond is not None and guidance_scale != 1.0:
                x_in = jnp.concatenate([img] * 3, axis=0)
                t_in = jnp.concatenate([t] * 3, axis=0)
                c_in = cond_simple.concat_batch(cond).concat_batch(uncond)
                out = apply_fn(x_in, t_in, c_in)
                e_uc, e_c, e_cs = jnp.split(out, 3, axis=0)
                model_output = e_uc + guidance_scale * (
                    (cond_weight * e_c + (1 - cond_weight) * e_cs) - e_uc
                )
            else:
                model_output = apply_fn(img, t, cond_simple)
            nk = jax.random.fold_in(jax.random.fold_in(key, salt), step["i"])
            noise = jax.random.normal(nk, img.shape, img.dtype)
            img, _ = _ddim_update(
                model, img, t, model_output,
                step["a_t"], step["a_prev"], step["sqrt_one_minus_at"], step["sigma"],
                noise, temperature,
            )
            return img, None

        img, _ = jax.lax.scan(body, img, tabs)
        return img

    n = tables.num_steps
    # indices run n-1 .. 0; phase 1 covers indices >= Tm (the first n-Tm scan
    # steps), phase 2 the remaining Tm indices
    img = run_phase(img, _subtables(tables, Tm, n), guided=True, salt=2)
    img = run_phase(img, _subtables(tables, 0, Tm), guided=False, salt=3)
    return img
