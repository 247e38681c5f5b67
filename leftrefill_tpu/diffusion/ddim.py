"""DDIM sampling as fused ``lax.scan`` loops with batched CFG.

Behavioural reference: /root/reference/ldm/models/diffusion/ddim.py —
- make_schedule / tables: :23-52 (tables live in schedules.DDIMTables)
- ddim_sampling hot loop + p_sample_ddim: :224-386
- CFG by batch-doubling (uncond first): :317-343
- known-region renoise ``img = q_sample(x0)*mask + (1-mask)*img``: :257-260
- multi-cond consistent sampling (right-half latent sync): :146-222
- DDIM inversion encode / stochastic_encode / decode: :388-471

TPU design: the whole 50-step loop is one scanned, jitted computation; the
cond/uncond UNet passes run as a single doubled batch; all schedule tables are
closed-over constants stacked per-step in scan order (descending t).  Nothing
in the loop is data-dependent Python.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from leftrefill_tpu.diffusion.core import Conditioning, LeftRefillModel
from leftrefill_tpu.diffusion.schedules import DDIMTables

# apply_model closure: (x, t, cond) -> model output
ApplyFn = Callable[[jax.Array, jax.Array, Conditioning], jax.Array]


def _scan_tables(tables: DDIMTables) -> dict[str, np.ndarray]:
    """Per-step arrays in *scan order* (descending t: step 0 = largest t)."""
    rev = slice(None, None, -1)
    return dict(
        t=tables.timesteps[rev].astype(np.int32),
        a_t=tables.alphas[rev],
        a_prev=tables.alphas_prev[rev],
        sqrt_one_minus_at=tables.sqrt_one_minus_alphas[rev],
        sigma=tables.sigmas[rev],
    )


def _guided_eps(
    model: LeftRefillModel,
    apply_fn: ApplyFn,
    x: jax.Array,
    t: jax.Array,
    cond: Conditioning,
    uncond: Optional[Conditioning],
    scale: jax.Array | float,
):
    """One (optionally CFG-doubled) model call -> model output
    (p_sample_ddim, ddim.py:311-343)."""
    if uncond is None:
        return apply_fn(x, t, cond)
    x_in = jnp.concatenate([x, x], axis=0)
    t_in = jnp.concatenate([t, t], axis=0)
    c_in = cond.concat_batch(uncond)  # [uncond; cond]
    out = apply_fn(x_in, t_in, c_in)
    out_uncond, out_cond = jnp.split(out, 2, axis=0)
    return out_uncond + scale * (out_cond - out_uncond)


def _ddim_update(
    model: LeftRefillModel,
    x: jax.Array,
    t: jax.Array,
    model_output: jax.Array,
    a_t,
    a_prev,
    sqrt_one_minus_at,
    sigma,
    noise: jax.Array,
    temperature: float,
):
    """The x_{t} -> x_{t-1} update (p_sample_ddim, ddim.py:345-381)."""
    if model.parameterization == "v":
        e_t = model.predict_eps_from_z_and_v(x, t, model_output)
        pred_x0 = model.predict_start_from_z_and_v(x, t, model_output)
    else:
        e_t = model_output
        pred_x0 = (x - sqrt_one_minus_at * e_t) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * e_t
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma * noise * temperature
    return x_prev, pred_x0


def ddim_sample(
    model: LeftRefillModel,
    apply_fn: ApplyFn,
    tables: DDIMTables,
    cond: Conditioning,
    key: jax.Array,
    shape: tuple[int, ...],
    uncond: Optional[Conditioning] = None,
    guidance_scale: float = 1.0,
    x_T: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    x0: Optional[jax.Array] = None,
    temperature: float = 1.0,
    ucg_schedule: Optional[np.ndarray] = None,
    return_intermediates: bool = False,
):
    """Full DDIM sampling loop (ddim_sampling, ddim.py:224-302) as one scan.

    mask/x0: latent-space known-region renoising — mask==1 pixels are replaced
    by q_sample(x0, t) each step (ddim.py:257-260).
    Returns the final latent [*shape]; with ``return_intermediates`` also a
    dict of per-step stacks {"x_inter": [S, *shape], "pred_x0": [S, *shape]}
    (the reference's intermediates log, ddim.py:245-300 — used for the
    denoise_row diagnostics in log_images, ddpm.py:1221-1224).
    """
    use_cfg = uncond is not None and guidance_scale != 1.0
    uncond_ = uncond if use_cfg else None

    tabs = {k: jnp.asarray(v) for k, v in _scan_tables(tables).items()}
    n_steps = tables.num_steps
    if ucg_schedule is not None:
        assert len(ucg_schedule) == n_steps
        tabs["g"] = jnp.asarray(ucg_schedule, dtype=jnp.float32)
    else:
        tabs["g"] = jnp.full((n_steps,), guidance_scale, dtype=jnp.float32)
    tabs["i"] = jnp.arange(n_steps, dtype=jnp.int32)

    key, init_key = jax.random.split(key)
    img = x_T if x_T is not None else jax.random.normal(init_key, shape, dtype=jnp.float32)
    b = shape[0]

    def body(img, step):
        t = jnp.full((b,), step["t"], dtype=jnp.int32)
        if mask is not None:
            assert x0 is not None
            nk = jax.random.fold_in(jax.random.fold_in(key, 1), step["i"])
            img_orig = model.q_sample(x0, t, jax.random.normal(nk, x0.shape, x0.dtype))
            img = img_orig * mask + (1.0 - mask) * img

        out = _guided_eps(model, apply_fn, img, t, cond, uncond_, step["g"])
        nk = jax.random.fold_in(jax.random.fold_in(key, 2), step["i"])
        noise = jax.random.normal(nk, img.shape, img.dtype)
        img, pred_x0 = _ddim_update(
            model, img, t, out,
            step["a_t"], step["a_prev"], step["sqrt_one_minus_at"], step["sigma"],
            noise, temperature,
        )
        ys = (img, pred_x0) if return_intermediates else None
        return img, ys

    img, ys = jax.lax.scan(body, img, tabs)
    if return_intermediates:
        return img, {"x_inter": ys[0], "pred_x0": ys[1]}
    return img


def ddim_multi_sample(
    model: LeftRefillModel,
    apply_fn: ApplyFn,
    tables: DDIMTables,
    conds: Conditioning,  # stacked leading axis K (one per reference pair)
    key: jax.Array,
    shape: tuple[int, ...],
    unconds: Optional[Conditioning] = None,  # stacked leading axis K
    guidance_scale: float = 1.0,
    x_T: Optional[jax.Array] = None,
    temperature: float = 1.0,
) -> jax.Array:
    """Multi-cond consistent sampling (ddim_multi_sampling, ddim.py:146-222):
    one latent per conditioning, all stepped in lock-step (vmapped over the K
    axis), then the *right half* of one randomly chosen latent is copied into
    every latent after each step.  Returns latent 0 ([*shape]).

    Note the reference keeps a single shared initial latent for all conds when
    x_T is None (``[torch.randn(shape)] * len(cond)``, ddim.py:158).
    """
    use_cfg = unconds is not None and guidance_scale != 1.0
    unconds_ = unconds if use_cfg else None
    k_conds = jax.tree_util.tree_leaves(conds)[0].shape[0]

    tabs = {k: jnp.asarray(v) for k, v in _scan_tables(tables).items()}
    tabs["i"] = jnp.arange(tables.num_steps, dtype=jnp.int32)

    key, init_key = jax.random.split(key)
    if x_T is None:
        shared = jax.random.normal(init_key, shape, dtype=jnp.float32)
        imgs = jnp.broadcast_to(shared, (k_conds,) + tuple(shape))
    else:
        imgs = x_T  # [K, *shape]
    b = shape[0]
    w_half = shape[2] // 2  # NHWC latent: [B, h, w, c], right half = w//2:

    # K conds fold into ONE flat UNet batch (2*K*b under CFG) — the reference
    # loops the K pairs sequentially (ddim.py:191-212); on TPU a single fused
    # batch keeps the MXU saturated and hits the Pallas kernels' native batch
    # path instead of their vmap batching rule (round-3, VERDICT item 9).
    flat_shape = (k_conds * b,) + tuple(shape[1:])
    flatten = lambda a: a.reshape((k_conds * b,) + a.shape[2:])
    conds_flat = jax.tree_util.tree_map(flatten, conds)
    unconds_flat = jax.tree_util.tree_map(flatten, unconds_) if unconds_ is not None else None

    def body(imgs, step):
        nk = jax.random.fold_in(jax.random.fold_in(key, 2), step["i"])
        noise = jax.random.normal(nk, imgs.shape, imgs.dtype)
        t = jnp.full((k_conds * b,), step["t"], dtype=jnp.int32)
        flat = imgs.reshape(flat_shape)
        out = _guided_eps(
            model, apply_fn, flat, t, conds_flat, unconds_flat, guidance_scale
        )
        flat, _ = _ddim_update(
            model, flat, t, out,
            step["a_t"], step["a_prev"], step["sqrt_one_minus_at"], step["sigma"],
            noise.reshape(flat_shape), temperature,
        )
        imgs = flat.reshape(imgs.shape)
        # sync: copy the right half of a randomly chosen latent into all
        ck = jax.random.fold_in(jax.random.fold_in(key, 3), step["i"])
        pick = jax.random.randint(ck, (), 0, k_conds)
        right = jax.lax.dynamic_index_in_dim(imgs, pick, axis=0, keepdims=False)
        right = right[:, :, w_half:, :]
        imgs = imgs.at[:, :, :, w_half:, :].set(right[None])
        return imgs, None

    imgs, _ = jax.lax.scan(body, imgs, tabs)
    return imgs[0]


def ddim_stochastic_encode(
    model: LeftRefillModel,
    tables: DDIMTables,
    x0: jax.Array,
    t_index: jax.Array,
    noise: jax.Array,
) -> jax.Array:
    """stochastic_encode (ddim.py:435-449): q_sample using the DDIM
    sub-schedule alphas, indexed by DDIM step index."""
    sqrt_a = jnp.sqrt(jnp.asarray(tables.alphas))
    sqrt_1ma = jnp.asarray(tables.sqrt_one_minus_alphas)
    bshape = (x0.shape[0],) + (1,) * (x0.ndim - 1)
    return sqrt_a[t_index].reshape(bshape) * x0 + sqrt_1ma[t_index].reshape(bshape) * noise


def ddim_encode(
    model: LeftRefillModel,
    apply_fn: ApplyFn,
    tables: DDIMTables,
    x0: jax.Array,
    cond: Conditioning,
    t_enc: int,
    uncond: Optional[Conditioning] = None,
    guidance_scale: float = 1.0,
) -> jax.Array:
    """Deterministic DDIM inversion (encode, ddim.py:388-433)."""
    use_cfg = uncond is not None and guidance_scale != 1.0
    uncond_ = uncond if use_cfg else None
    alphas_next = jnp.asarray(tables.alphas[:t_enc])
    alphas = jnp.asarray(tables.alphas_prev[:t_enc])
    steps = jnp.arange(t_enc, dtype=jnp.int32)
    b = x0.shape[0]

    def body(x_next, i):
        t = jnp.full((b,), i, dtype=jnp.int32)
        eps = _guided_eps(model, apply_fn, x_next, t, cond, uncond_, guidance_scale)
        a_n, a = alphas_next[i], alphas[i]
        xt_weighted = jnp.sqrt(a_n / a) * x_next
        weighted = jnp.sqrt(a_n) * (jnp.sqrt(1 / a_n - 1) - jnp.sqrt(1 / a - 1)) * eps
        return xt_weighted + weighted, None

    x_next, _ = jax.lax.scan(body, x0, steps)
    return x_next


def ddim_decode(
    model: LeftRefillModel,
    apply_fn: ApplyFn,
    tables: DDIMTables,
    x_latent: jax.Array,
    cond: Conditioning,
    t_start: int,
    uncond: Optional[Conditioning] = None,
    guidance_scale: float = 1.0,
) -> jax.Array:
    """decode (ddim.py:451-471): sample from DDIM index t_start down to 0,
    deterministic (the reference never passes eta here)."""
    use_cfg = uncond is not None and guidance_scale != 1.0
    uncond_ = uncond if use_cfg else None
    sub = DDIMTables(
        timesteps=tables.timesteps[:t_start],
        alphas=tables.alphas[:t_start],
        alphas_prev=tables.alphas_prev[:t_start],
        sqrt_one_minus_alphas=tables.sqrt_one_minus_alphas[:t_start],
        sigmas=tables.sigmas[:t_start],
        eta=tables.eta,
    )
    tabs = {k: jnp.asarray(v) for k, v in _scan_tables(sub).items()}
    b = x_latent.shape[0]

    def body(x, step):
        t = jnp.full((b,), step["t"], dtype=jnp.int32)
        out = _guided_eps(model, apply_fn, x, t, cond, uncond_, guidance_scale)
        x, _ = _ddim_update(
            model, x, t, out,
            step["a_t"], step["a_prev"], step["sqrt_one_minus_at"], step["sigma"],
            jnp.zeros_like(x), 1.0,
        )
        return x, None

    x, _ = jax.lax.scan(body, x_latent, tabs)
    return x
