"""Multi-head attention ops: XLA reference path + Pallas flash-attention path.

Behavioural reference: /root/reference/ldm/modules/attention.py:147-250 —
scaled dot-product attention with an fp32 QK^T softmax island under autocast
(_ATTN_PRECISION == "fp32", attention.py:176-181), used for both self- and
cross-attention (xformers memory_efficient_attention on the CUDA side,
attention.py:236).  On TPU the memory-efficient implementation is a Pallas
flash-attention kernel (leftrefill_tpu/ops/flash_attention.py); this module
dispatches between it and a plain-XLA einsum path (CPU tests / tiny shapes).
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp

AttnImpl = Literal["auto", "xla", "flash"]

# Global default, overridable per-call. "auto" = flash on TPU when shapes
# qualify, else XLA.
_DEFAULT_IMPL: AttnImpl = "auto"


def set_default_attn_impl(impl: AttnImpl) -> None:
    global _DEFAULT_IMPL
    _DEFAULT_IMPL = impl


def get_default_attn_impl() -> AttnImpl:
    return _DEFAULT_IMPL


def _xla_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float
) -> jax.Array:
    """[B, H, Nq, D] x [B, H, Nk, D] -> [B, H, Nq, D] with fp32 softmax."""
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    sim = jnp.einsum("bhid,bhjd->bhij", qf, kf) * scale
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
    return out


def _flash_qualifies(q: jax.Array, k: jax.Array) -> bool:
    # Pallas kernel needs TPU + lane-aligned head dim + long enough sequences
    # to beat the fused XLA path.
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    d = q.shape[-1]
    nq, nk = q.shape[-2], k.shape[-2]
    # fp32 long-sequence K/V residents exceed scoped vmem (measured: 16.05M
    # at nk=8192 even with 16-row q blocks) — fp32 fidelity runs take XLA...
    from leftrefill_tpu.ops.flash_attention import KV_RESIDENT_MAX

    if q.dtype == jnp.float32 and 4096 <= nk <= KV_RESIDENT_MAX:
        return False
    # ...EXCEPT beyond the resident budget (V=4 multiview, nk=32768), where
    # the naive XLA path materializes an [nk, nk] fp32 score tensor (21.5GB
    # at 32768 — HBM OOM, bench_logs_r5/mv_v4_quality_r5.log) and flash
    # streams K/V in chunks instead (_flash_forward_kvchunk).
    return (
        on_tpu
        and d in (64, 128)
        and nq >= 256
        and nk >= 256
        and nq % 128 == 0
        and nk % 128 == 0
    )


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    impl: AttnImpl | None = None,
) -> jax.Array:
    """Attention over packed head tensors.

    Args:
      q: [B, Nq, H*D]
      k, v: [B, Nk, H*D]
      num_heads: H.
    Returns: [B, Nq, H*D] in q.dtype.
    """
    b, nq, inner = q.shape
    nk = k.shape[1]
    d = inner // num_heads
    scale = d**-0.5

    qh = q.reshape(b, nq, num_heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, nk, num_heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, nk, num_heads, d).transpose(0, 2, 1, 3)

    use = impl or _DEFAULT_IMPL
    if use == "auto":
        use = "flash" if _flash_qualifies(qh, kh) else "xla"

    if use == "flash":
        from leftrefill_tpu.ops.flash_attention import flash_attention

        out = flash_attention(qh, kh, vh, scale)
    else:
        out = _xla_attention(qh, kh, vh, scale)

    out = out.transpose(0, 2, 1, 3).reshape(b, nq, inner)
    return out.astype(q.dtype)


def attention_probs(q: jax.Array, k: jax.Array, num_heads: int) -> jax.Array:
    """Head-averaged attention probabilities for visualization
    (the reference's save_attn_vis / return_attn debug path,
    multiview_attention.py:208-295, ddim.py:282-300).
    q: [B, Nq, H*D], k: [B, Nk, H*D] -> [B, Nq, Nk] fp32."""
    b, nq, inner = q.shape
    nk = k.shape[1]
    d = inner // num_heads
    qh = q.reshape(b, nq, num_heads, d).transpose(0, 2, 1, 3).astype(jnp.float32)
    kh = k.reshape(b, nk, num_heads, d).transpose(0, 2, 1, 3).astype(jnp.float32)
    sim = jnp.einsum("bhid,bhjd->bhij", qh, kh) * (d**-0.5)
    return jax.nn.softmax(sim, axis=-1).mean(axis=1)


def causal_text_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int
) -> jax.Array:
    """Causal self-attention for the CLIP text tower (77 tokens).

    q/k/v: [B, N, H*D].  fp32 softmax with additive -inf causal mask,
    matching open_clip's text transformer attn_mask semantics.
    """
    b, n, inner = q.shape
    d = inner // num_heads
    scale = d**-0.5
    qh = q.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3).astype(jnp.float32)
    kh = k.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3).astype(jnp.float32)
    vh = v.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)
    sim = jnp.einsum("bhid,bhjd->bhij", qh, kh) * scale
    mask = jnp.tril(jnp.ones((n, n), dtype=bool))
    sim = jnp.where(mask[None, None], sim, jnp.finfo(jnp.float32).min)
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", attn.astype(vh.dtype), vh)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
    return out.astype(q.dtype)
