"""Low-level TPU-friendly layer ops shared by all models.

Behavioural references:
- GroupNorm32 (fp32 compute island): /root/reference/ldm/modules/diffusionmodules/util.py:217-219
- timestep_embedding (cos-first): /root/reference/ldm/modules/diffusionmodules/util.py:154-174
- VAE sinusoidal embedding (sin-first): /root/reference/ldm/modules/diffusionmodules/model.py:21-39
- nearest x2 up / stride-2 down: openaimodel.py:90-159, model.py:51-88

All spatial tensors are NHWC (TPU-native); the reference is NCHW.
"""

from __future__ import annotations

import math
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# A/B knob for the GroupNorm32 fast_affine default (scripts/tpu_r3_int8_quality.py
# characterizes the bf16-affine deviation vs the reference's full-fp32 island)
_FAST_AFFINE_DEFAULT = os.environ.get("LEFTREFILL_GN_FAST_AFFINE", "1") == "1"


def timestep_embedding(
    timesteps: jax.Array, dim: int, max_period: int = 10000, dtype: Dtype = jnp.float32
) -> jax.Array:
    """Sinusoidal timestep embedding, **cos-first** concat ([cos, sin]) like the
    UNet's embedding (diffusionmodules/util.py:163-171).  fp32 math."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb.astype(dtype)


def vae_timestep_embedding(timesteps: jax.Array, embedding_dim: int) -> jax.Array:
    """DDPM-style sinusoidal embedding, **sin-first**, denominator (half-1)
    (diffusionmodules/model.py:21-39).  Unused by frozen LeftRefill VAE
    (temb_ch=0) but kept for parity of the block API."""
    half_dim = embedding_dim // 2
    emb = math.log(10000) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class GroupNorm32(nn.Module):
    """GroupNorm with a forced fp32 compute island.

    The reference keeps GroupNorm in fp32 under fp16 autocast
    (GroupNorm32, diffusionmodules/util.py:217-219); on TPU we do the same
    under bf16: upcast input to fp32, normalize, cast back.

    ``eps`` differs between call sites in the reference: the UNet uses the
    torch default 1e-5 (normalization(), util.py:202-208), the VAE/attention
    Normalize uses 1e-6 (attention.py:90-91, model.py:47-48).
    """

    num_groups: int = 32
    eps: float = 1e-5
    param_dtype: Dtype = jnp.float32
    # fp32 statistics always; when fast_affine the normalize+affine runs as a
    # single fused multiply-add in the input dtype (one bf16 rounding step vs
    # the reference's full-fp32 GN — the output is bf16 either way).
    # None -> the LEFTREFILL_GN_FAST_AFFINE env default (read at trace time,
    # so scripts can flip the module global for A/B runs).  Characterized on
    # the full 865M UNet: see PARITY.md round-3 / scripts/tpu_r3_int8_quality.py.
    fast_affine: bool | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        return group_norm32(
            x, scale, bias,
            num_groups=self.num_groups, eps=self.eps, fast_affine=self.fast_affine,
        )


def adjust_groups(num_groups: int, c: int) -> int:
    """real configs always have c % 32 == 0; clamp only for tiny test nets."""
    g = min(num_groups, c)
    while c % g:
        g -= 1
    return g


def group_norm32(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    num_groups: int = 32,
    eps: float = 1e-5,
    fast_affine: bool | None = None,
) -> jax.Array:
    """Functional GroupNorm32 core (shared by the module and the fused
    ResBlock paths)."""
    orig_dtype = x.dtype
    c = x.shape[-1]
    g = adjust_groups(num_groups, c)
    b = x.shape[0]
    spatial = x.shape[1:-1]
    xg = x.reshape(b, *spatial, g, c // g)
    red_axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    # fp32 statistics (XLA fuses the upcast into the reduction)
    mean = jnp.mean(xg.astype(jnp.float32), axis=red_axes, keepdims=True)
    var = jnp.var(xg.astype(jnp.float32), axis=red_axes, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)

    # fold (mean, rstd, gamma, beta) into per-(batch, channel) A, B;
    # broadcast over spatial happens lazily inside the fused madd
    gamma = scale.astype(jnp.float32).reshape(g, c // g)
    beta = bias.astype(jnp.float32).reshape(g, c // g)
    one_spatial = (1,) * len(spatial)
    a = (rstd * gamma).reshape(b, *one_spatial, c)
    bb = (beta - mean * rstd * gamma).reshape(b, *one_spatial, c)
    fast = fast_affine if fast_affine is not None else _FAST_AFFINE_DEFAULT
    if fast and orig_dtype != jnp.float32:
        y = x * a.astype(orig_dtype) + bb.astype(orig_dtype)
    else:
        y = (x.astype(jnp.float32) * a + bb).astype(orig_dtype)
    return y


def nearest_upsample_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x upsample on NHWC == repeat each pixel twice per
    spatial dim (exactly F.interpolate(scale_factor=2, mode='nearest'))."""
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


def avg_pool_2x(x: jax.Array) -> jax.Array:
    """2x2 stride-2 average pool on NHWC."""
    return nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2))


def zero_init() -> nn.initializers.Initializer:
    """Initializer for reference modules wrapped in zero_module()
    (diffusionmodules/util.py:177-183)."""
    return nn.initializers.zeros


def nearest_resize(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Nearest resize on NHWC matching torch F.interpolate(mode='nearest')
    semantics (floor of the source index scaled by in/out ratio).

    Used for the mask ↓8 in LatentInpaintDiffusion.get_input (ddpm.py:1678-1683).
    """
    x = jnp.asarray(x)
    b, h, w, c = x.shape
    oh, ow = out_hw
    # host-side index tables (static shapes) — keeps numpy inputs traceable
    rows = np.floor(np.arange(oh) * (h / oh)).astype(np.int32)
    cols = np.floor(np.arange(ow) * (w / ow)).astype(np.int32)
    return x[:, rows][:, :, cols]
