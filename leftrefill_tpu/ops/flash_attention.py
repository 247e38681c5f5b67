"""Pallas TPU flash-attention kernel for the stitched-canvas self-attention.

TPU-native replacement for the reference's xformers
``memory_efficient_attention`` CUDA kernel (attention.py:236), forward AND
backward.  The LeftRefill self-attention shapes are bounded and lane-friendly:
the 64x128 stitched latent gives sequences {8192, 2048, 512} at head_dim 64,
and multi-view joint self-attention reaches V*8192 tokens (V full canvases
joined; multiview_attention.py:448, concat_target=False as shipped).  Up to
Nk=16384 each head's full K/V tile fits comfortably in VMEM, so the kernels
block only ONE sequence dimension and keep the other operand fully resident
(its BlockSpec index is constant in the blocked coordinate, so Mosaic does
not re-DMA it), computing an exact fp32 softmax per block.  This is the
fastest shape for this size class: no online-softmax rescale passes, one MXU
matmul pair per block.  Beyond the resident budget (V=4: Nk=32768) K/V are
streamed in chunks over a third grid axis with VMEM-scratch accumulation —
see ``_flash_kvchunk_kernel``.

softmax guard: the usual row-max shift costs two extra VPU passes over the
[blk, N] tile (measured 42% of forward kernel time at N=8192).
exp(s)/sum(exp(s)) is *mathematically identical* to softmax whenever it does
not overflow: fp32 exp is finite to s<=88 and the row sum stays < 16384*e^75 <
fp32 max, so clamping logits at 75 is exact for any realistic attention logit
(SD2 logits are <~50) and degrades gracefully instead of producing inf beyond
it.  One fused min+exp pass instead of reduce+subtract+exp.

Backward (memory-bounded, xformers-equivalent for training at N=8192+):
the forward saves the softmax row sums ``l`` alongside o; the backward runs
two Pallas kernels that re-form the probability tiles blockwise —

  dq kernel (grid over q blocks, K/V resident):
    p  = exp(min(qK^T, 75)) / l
    dP = dO V^T ;  dS = p * (dP - D) ;  dq = scale * dS K
  dk/dv kernel (grid over k blocks, Q/dO resident):
    dV_blk = p^T dO ;  dK_blk = scale * dS^T q

with D = rowsum(dO * O) computed once in XLA (one elementwise pass).  No
[N, N] tensor is ever materialized in HBM, which is what makes a train step
at the full 8192-token sequence fit on one chip.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 128 keeps the fp32 score tile (blk_q x Nk) at <=4MB for Nk=8192 so q/k/v
# tiles + scores + probs fit the ~16MB VMEM budget even at batch 16.
DEFAULT_BLOCK_Q = 128
CLAMP = 75.0

# Debug/assert mode: row-max-shifted softmax (exact for ANY logit magnitude,
# costs ~42% more forward time at N=8192).  Turn on to validate the clamp
# guard, e.g. after LoRA fine-tuning ever trains attention weights.
_SAFE_SOFTMAX = os.environ.get("LEFTREFILL_FLASH_SAFE_SOFTMAX", "0") == "1"

# log2-domain softmax: fold log2(e) into the q prescale and use exp2 instead
# of exp.  Mathematically identical (exp(x) == exp2(x*log2e)); if the VPU's
# exp is microcoded as exp2(x*log2e), this deletes one full-tile multiply per
# [blk, N] score tile.  Default off until measured on-chip
# (scripts/tpu_r3_exp2_ab.py).
_EXP2 = os.environ.get("LEFTREFILL_FLASH_EXP2", "0") == "1"
LOG2E = 1.4426950408889634  # log2(e); CLAMP*LOG2E is the log2-domain clamp
LN2 = 0.6931471805599453


def set_safe_softmax(on: bool) -> None:
    global _SAFE_SOFTMAX
    _SAFE_SOFTMAX = bool(on)


def set_exp2(on: bool) -> None:
    global _EXP2
    _EXP2 = bool(on)


def _pick_block(
    n_other: int, n_blocked: int, dtype=jnp.bfloat16, cap: int | None = None
) -> int:
    """Forward block size: ONE fp32 score tile (blk x n_other) + its exp
    dominate VMEM.  fp32 inputs (fidelity reference runs) double the resident
    K/V so the q block shrinks.  `cap` bounds the block: the VJP-path forward
    (remat recompute inside the train step) passes DEFAULT_BLOCK_Q because the
    2x block's 16.12M scoped-vmem footprint compiles standalone but exceeds
    the 16M limit by 120K inside the rematted train graph (measured: the 865M
    B=2 train step failed AOT at blk256, ran at blk128 in r2)."""
    # only the resident path consults this, so n_other <= KV_RESIDENT_MAX
    # (= 8192) always holds — larger nk streams K/V via _kv_chunk_for; the
    # old blk 64/32 branches for resident nk up to 32768 were deleted with
    # that change (their plans were over scoped vmem anyway, r5c A/B logs).
    assert n_other <= KV_RESIDENT_MAX, n_other
    # 256 measured +2 TF/s over 128 at the ds1 shape (N=8192, D=64):
    # 78 -> 80 TF/s, same rel_err (scripts/tpu_r3_attnprobe2.py); the
    # 8MB fp32 score tile still fits with the resident bf16 K/V.
    blk = 2 * DEFAULT_BLOCK_Q
    if dtype == jnp.float32 and n_other >= 4096:
        # fp32 keeps the r2 sizing (an f32 plan at 2x blew scoped vmem)
        blk = max(min(blk, DEFAULT_BLOCK_Q) // 8, 16)
    if cap is not None:
        blk = min(blk, cap)
    blk = min(blk, n_blocked)
    # the q grid needs blk | n_blocked (no masked tail blocks in the kernel)
    while n_blocked % blk:
        blk //= 2
    return blk


def _pick_block_bwd(n_other: int, n_blocked: int) -> int:
    """dq-kernel block size: it holds FOUR fp32 (blk_q x Nk) tiles live
    (s, p, dP, dS) plus resident K/V — blk_q=128 at Nk=8192 measured 21.7MB
    against the 16MB scoped-vmem limit.  Nk is the minor (lane) dim, so
    shrinking blk_q (sublanes) genuinely shrinks the tiles."""
    if n_other <= 2048:
        blk = 128
    elif n_other <= 4096:
        blk = 64
    else:
        blk = 32
    return min(blk, n_blocked)


def _pick_block_bwd_chunk(nq: int, dtype=jnp.bfloat16) -> int:
    """STREAMING-dq block size: the four fp32 tiles are [blk_q, kv_chunk]
    (kv_chunk=1024), not [blk_q, nk], so blk_q can be far larger than the
    resident picker's 32-128 — and must be, for the forward's traffic math
    (K/V re-streams once per q block).  blk_q=512 puts the four tiles at
    8MB; 128 (the resident sizing the chunked path first shipped with)
    re-streams 4x more K/V.  fp32 operands halve the block (the forward's
    bf16-sized plan measured 1.62M over scoped vmem at f32 — same rule)."""
    blk = 256 if dtype == jnp.float32 else 512
    while nq % blk:
        blk //= 2
    assert nq % blk == 0 and blk >= 128, (nq, blk)
    return blk


# dkv kernel: the probability tiles are [q_chunk, blk_k] with blk_k in the
# LANE dim — narrowing blk_k below 128 does not shrink them (lanes pad to
# 128), and [*, nq, 1] lse operands pad to 128 lanes (4MB at nq=8192).  So
# the q dim is chunked via a third grid axis with dk/dv accumulated in VMEM
# scratch; every block stays small.
DKV_Q_CHUNK = 512
# dk/dv k-block (the blocked grid dim).  q/dO re-stream once per k block,
# so larger would be less traffic — but the A/B (scripts/tpu_r5_dkv_ab.py,
# bench_logs_r5/dkv_ab_r5c.log) measured 128/256/512 NEUTRAL at both the
# V=4 (b*h=10, N=32768) and 1-ref train (b*h=40, N=8192) shapes: the
# re-streaming is already hidden behind the kernel's five matmuls (unlike
# the dq kernel, where blk_q=512 was -26%).  128 stays.
DKV_BLOCK_K = 128

# Largest Nk kept fully VMEM-resident.  Beyond it, K/V stream in chunks via
# a third grid axis with o/l accumulated in VMEM scratch; the clamp-guard
# softmax needs NO online rescale for this (exp(min(s,75)) is
# chunk-independent and the row sum is additive); safe mode carries the
# classic running-max rescale.  The boundary is 8192 (the 1-ref ds1 shape,
# 96.8 TF/s resident) — NOT 16384: the blk64 resident plan at nk=16384
# (V=2 multiview joint attention) is 16.06M scoped vmem on paper, 64K OVER
# the limit; it happened to compile inside the r4 e2e graphs but fails AOT
# standalone (bench_logs_r5/kvchunk16k_ab_r5c.log), while the streaming
# kernel measures 79.6 TF/s at that shape.  V=4 (32768 tokens,
# multiview_attention.py:448 concat_target=False) failed AOT resident at
# 32.05M and streams at 89.4 TF/s.
KV_RESIDENT_MAX = 8192
KV_CHUNK = 1024  # small on purpose: see _pick_block_kvchunk (traffic math)


def _kv_chunk_for(nk: int) -> int | None:
    """None = keep K/V fully resident; else the streaming chunk size."""
    if nk <= KV_RESIDENT_MAX:
        return None
    c = KV_CHUNK
    while nk % c:
        c //= 2
    return c


def _pick_block_kvchunk(nq: int, dtype=jnp.bfloat16) -> int:
    """Streaming-path q block: K/V DMA traffic scales as (nq/blk_q)*nk — a
    small q block re-streams ALL of K/V once per block.  Measured at
    blk128/chunk8192 (b*h=10, N=32768): 47.1 TF/s, ~21GB of K/V DMA per ds1
    call (bench_logs_r5/kvchunk_smoke_r5b.log) vs the ~80-97 TF/s resident
    kernel.  So maximize blk_q and shrink the chunk instead — the K=64 MXU
    cycles are blk-independent (r5 headpack probe) and the K/V traffic
    drops with blk_q.  Sizing sweep at the V=4 shape (b*h=10, N=32768,
    bench_logs_r5/kvchunk_sweep_r5c.log): (1024,1024) 86.4 TF/s,
    (512,2048) 86.4, (1024,2048) 89.4, **(2048,1024) 89.5** — the 8MB
    fp32 score tile clears scoped vmem, and blk_q=2048 also halves the
    (already-hidden) K/V re-streaming, so it wins the tie.

    fp32 inputs (fidelity reference runs) halve the block: the bf16-sized
    blk2048 plan measured 17.62M scoped vmem at f32 nk=16384 (1.62M over —
    bench_logs_r5/mv_v2_quality_stream_r5c.log first attempt); blk1024 is
    the sizing the f32 V=4 quality cell ran at N=32768."""
    blk = 1024 if dtype == jnp.float32 else 2048
    while nq % blk:
        blk //= 2
    # the dispatcher guarantees nq % 128 == 0, so the loop always lands on a
    # divisor >= 128; a non-divisor block would silently drop tail q rows
    assert nq % blk == 0 and blk >= 128, (nq, blk)
    return blk


# ---------------------------------------------------------------------------
# forward


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, l_ref, *, scale: float, safe: bool, exp2: bool
):
    # fold the softmax scale into q (a [blk_q, D] multiply) instead of the
    # [blk_q, Nk] score tile — saves a full-tile VPU pass.  exp2 mode folds
    # log2(e) in as well, so the scores are already log2-domain.
    q = q_ref[0].astype(jnp.float32) * (scale * LOG2E if exp2 and not safe else scale)
    k = k_ref[0]  # [Nk, D]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q,
        k.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if safe:  # exact shifted softmax (debug/assert mode)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
    elif exp2:
        p = jnp.exp2(jnp.minimum(s, CLAMP * LOG2E))
    else:
        p = jnp.exp(jnp.minimum(s, CLAMP))
    # underflow guard (advisor r2): a q-row whose every logit is below ~-87
    # gives p==0 for all keys and l==0; clamp the divisor so o degrades to 0
    # (and lse to a finite floor) instead of NaN.  One [blk_q,1] VPU op.
    l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), jnp.finfo(jnp.float32).tiny)
    o = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)
    # residual for the backward: the true logsumexp of the (clamped) scores,
    # mode-independent — p_bwd = exp(s' - lse) <= 1 can never overflow
    lse = jnp.log(l)
    if safe:
        lse = lse + m
    l_ref[0] = lse  # [blk_q, 1]


def _flash_kvchunk_kernel(
    q_ref, k_ref, v_ref, o_ref, l_ref, o_acc, l_acc, m_acc,
    *, scale: float, safe: bool, exp2: bool
):
    """Streaming-K/V forward for Nk beyond the resident budget (V=4
    multiview joint attention, N=32768).  Grid axis 2 walks k chunks; o and
    the softmax row sum accumulate in fp32 VMEM scratch and normalize once
    at the last chunk.  Non-safe modes need no inter-chunk rescale: the
    clamp guard makes every partial exp exact (see module docstring)."""
    c = pl.program_id(2)
    log2dom = exp2 and not safe

    @pl.when(c == 0)
    def _zero():
        o_acc[...] = jnp.zeros_like(o_acc)
        l_acc[...] = jnp.zeros_like(l_acc)
        m_acc[...] = jnp.full_like(m_acc, -jnp.inf)

    q = q_ref[0].astype(jnp.float32) * (scale * LOG2E if log2dom else scale)
    k = k_ref[0]  # [kv_chunk, D]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if safe:  # online softmax: running row max with rescale (debug mode)
        m_new = jnp.maximum(m_acc[...], jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_acc[...] - m_new)  # first chunk: exp(-inf - m) = 0
        p = jnp.exp(s - m_new)
        l_acc[...] = l_acc[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        o_acc[...] = o_acc[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_acc[...] = m_new
    else:
        if log2dom:
            p = jnp.exp2(jnp.minimum(s, CLAMP * LOG2E))
        else:
            p = jnp.exp(jnp.minimum(s, CLAMP))
        l_acc[...] += jnp.sum(p, axis=-1, keepdims=True)
        o_acc[...] += jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(c == pl.num_programs(2) - 1)
    def _write():
        l = jnp.maximum(l_acc[...], jnp.finfo(jnp.float32).tiny)
        o_ref[0] = (o_acc[...] / l).astype(o_ref.dtype)
        lse = jnp.log(l)
        if safe:
            lse = lse + m_acc[...]
        l_ref[0] = lse


def _flash_forward_kvchunk(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
    kv_chunk: int, blk_cap: int | None,
) -> tuple[jax.Array, jax.Array]:
    b, h, nq, d = q.shape
    nk = k.shape[2]
    del blk_cap  # resident-plan cap: the streaming plan is ~8M scoped vmem
    blk_q = _pick_block_kvchunk(nq, q.dtype)

    qf = q.reshape(b * h, nq, d)
    kf = k.reshape(b * h, nk, d)
    vf = v.reshape(b * h, nk, d)

    grid = (b * h, nq // blk_q, nk // kv_chunk)
    o, l = pl.pallas_call(
        functools.partial(
            _flash_kvchunk_kernel, scale=scale, safe=_SAFE_SOFTMAX, exp2=_EXP2
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, nq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, nq, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda i, j, c: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_chunk, d), lambda i, j, c: (i, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_chunk, d), lambda i, j, c: (i, c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, blk_q, d), lambda i, j, c: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_q, 1), lambda i, j, c: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((blk_q, d), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
            pltpu.VMEM((blk_q, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nq * nk * d,
            bytes_accessed=(qf.size + kf.size + vf.size + b * h * nq * d) * q.dtype.itemsize,
            transcendentals=b * h * nq * nk,
        ),
    )(qf, kf, vf)
    return o.reshape(b, h, nq, d), l


def _flash_forward(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float, blk_cap: int | None = None
) -> tuple[jax.Array, jax.Array]:
    """Returns (o [B,H,Nq,D], lse [B*H,Nq,1] fp32 softmax logsumexp).  lse
    keeps a trailing singleton dim: Mosaic requires the last two block dims to
    divide (8,128) or equal the array dims, which (blk_q, 1) satisfies."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    kv_chunk = _kv_chunk_for(nk)
    if kv_chunk is not None:
        return _flash_forward_kvchunk(q, k, v, scale, kv_chunk, blk_cap)
    # The 2x (blk256) forward block has a 16.12M scoped-vmem footprint — over
    # the 16M limit on paper, but Mosaic shaves it under the measured-good
    # conditions (b*h <= 20: the b1/b2 CFG inference graphs, +2 TF/s at ds1).
    # At b*h = 40 (batch-4 CFG) the same kernel fails AOT by 120K
    # (bench_logs_r4/bench_b4_r4.log), exactly like the rematted train graph
    # did — so larger batches keep the always-compiling blk128 sizing.
    # Kept as a measured constant DELIBERATELY (r4 advisor asked for a
    # byte-estimate-derived cap): the static estimate rejects blk256 in
    # every case, so deriving the cap from it would forfeit the measured
    # +2 TF/s at b1/b2 — the constant is the empirical boundary of a Mosaic
    # allocation behavior no formula here predicts.  The other over-VMEM
    # axis the advisor flagged (nk-driven) is gone: nk > KV_RESIDENT_MAX
    # routes to the streaming path above before this sizing is consulted.
    eff_cap = blk_cap if b * h <= 20 else min(blk_cap or DEFAULT_BLOCK_Q, DEFAULT_BLOCK_Q)
    blk_q = _pick_block(nk, nq, q.dtype, cap=eff_cap)

    qf = q.reshape(b * h, nq, d)
    kf = k.reshape(b * h, nk, d)
    vf = v.reshape(b * h, nk, d)

    grid = (b * h, nq // blk_q)
    o, l = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, safe=_SAFE_SOFTMAX, exp2=_EXP2),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, nq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, nq, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nq * nk * d,
            bytes_accessed=(qf.size + kf.size + vf.size + b * h * nq * d) * q.dtype.itemsize,
            transcendentals=b * h * nq * nk,
        ),
    )(qf, kf, vf)
    return o.reshape(b, h, nq, d), l


# ---------------------------------------------------------------------------
# backward


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, l_ref, dd_ref, dq_ref, *, scale, safe, exp2
):
    log2dom = exp2 and not safe  # log2-domain scores (see _flash_kernel)
    q = q_ref[0].astype(jnp.float32) * (scale * LOG2E if log2dom else scale)
    k = k_ref[0]  # [Nk, D] resident
    v = v_ref[0]
    do = do_ref[0]  # [blk_q, D]
    lse = l_ref[0]  # [blk_q, 1] logsumexp (natural domain in every mode)
    dcap = dd_ref[0]  # [blk_q, 1] = rowsum(dO * O)
    s = jax.lax.dot_general(
        q, k.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    clamp = CLAMP * LOG2E if log2dom else CLAMP
    if log2dom:
        p = jnp.exp2(jnp.minimum(s, clamp) - lse * LOG2E)
    else:
        p = jnp.exp((s if safe else jnp.minimum(s, CLAMP)) - lse)
    dp = jax.lax.dot_general(
        do, v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dcap)
    if not safe:
        # clamp envelope (advisor r2): for s > CLAMP the forward is constant
        # in s (min saturates), so its true gradient is 0 — mask it
        ds = jnp.where(s <= clamp, ds, 0.0)
    dq = jax.lax.dot_general(
        ds.astype(k.dtype), k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _flash_bwd_dq_chunk_kernel(
    q_ref, k_ref, v_ref, do_ref, l_ref, dd_ref, dq_ref, dq_acc,
    *, scale, safe, exp2
):
    """Streaming-K/V dq for Nk beyond the resident budget.  Exact per chunk
    in EVERY mode: p = exp(s' - lse) uses the saved logsumexp (which already
    contains the row max in safe mode), so chunks are independent and dq is
    the plain sum over them."""
    c = pl.program_id(2)
    log2dom = exp2 and not safe

    @pl.when(c == 0)
    def _zero():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = q_ref[0].astype(jnp.float32) * (scale * LOG2E if log2dom else scale)
    k = k_ref[0]  # [kv_chunk, D]
    v = v_ref[0]
    do = do_ref[0]
    lse = l_ref[0]
    dcap = dd_ref[0]
    s = jax.lax.dot_general(
        q, k.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    clamp = CLAMP * LOG2E if log2dom else CLAMP
    if log2dom:
        p = jnp.exp2(jnp.minimum(s, clamp) - lse * LOG2E)
    else:
        p = jnp.exp((s if safe else jnp.minimum(s, CLAMP)) - lse)
    dp = jax.lax.dot_general(
        do, v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dcap)
    if not safe:
        ds = jnp.where(s <= clamp, ds, 0.0)
    dq_acc[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(c == pl.num_programs(2) - 1)
    def _write():
        dq_ref[0] = (dq_acc[...] * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    k_ref, v_ref, q_ref, do_ref, l_ref, dd_ref, dk_ref, dv_ref, dk_acc, dv_acc,
    *, scale, safe, exp2
):
    qc = pl.program_id(2)
    log2dom = exp2 and not safe

    @pl.when(qc == 0)
    def _zero():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    k = k_ref[0]  # [blk_k, D]
    v = v_ref[0]
    # [chunk, D]; dk below reuses this prescaled q, so the extra LOG2E factor
    # of the log2 domain is divided back out at the final accumulator write
    q = q_ref[0].astype(jnp.float32) * (scale * LOG2E if log2dom else scale)
    do = do_ref[0]
    lse = l_ref[0]  # [chunk, 1]
    dcap = dd_ref[0]
    s = jax.lax.dot_general(
        q, k.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [chunk, blk_k]
    clamp = CLAMP * LOG2E if log2dom else CLAMP
    if log2dom:
        p = jnp.exp2(jnp.minimum(s, clamp) - lse * LOG2E)
    else:
        p = jnp.exp((s if safe else jnp.minimum(s, CLAMP)) - lse)
    dv_acc[...] += jax.lax.dot_general(
        p.astype(do.dtype), do,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [blk_k, D]
    dp = jax.lax.dot_general(
        do, v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [chunk, blk_k]
    ds = p * (dp - dcap)
    if not safe:
        ds = jnp.where(s <= clamp, ds, 0.0)  # clamp envelope, as in dq kernel
    dk_acc[...] += jax.lax.dot_general(
        ds.astype(k.dtype), q.astype(k.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [blk_k, D]

    @pl.when(qc == pl.num_programs(2) - 1)
    def _write():
        # log2 domain: dk accumulated dS^T (q*scale*log2e) — divide the
        # log2e back out ([blk_k, D] scalar multiply, once per k block)
        fix = LN2 if log2dom else 1.0
        dk_ref[0] = (dk_acc[...] * fix).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_backward(q, k, v, o, l, g, scale):
    b, h, nq, d = q.shape
    nk = k.shape[2]

    qf = q.reshape(b * h, nq, d)
    kf = k.reshape(b * h, nk, d)
    vf = v.reshape(b * h, nk, d)
    gf = g.reshape(b * h, nq, d).astype(q.dtype)
    lf = l  # [b*h, nq, 1]
    # D = rowsum(dO * O): one fused elementwise pass in XLA
    df = jnp.sum(
        g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    ).reshape(b * h, nq, 1)

    kv_chunk = _kv_chunk_for(nk)
    cost_dq = pl.CostEstimate(
        flops=6 * b * h * nq * nk * d,
        bytes_accessed=(qf.size + kf.size + vf.size + 2 * gf.size) * q.dtype.itemsize,
        transcendentals=b * h * nq * nk,
    )
    if kv_chunk is not None:
        blk_q = _pick_block_bwd_chunk(nq, q.dtype)
        dq = pl.pallas_call(
            functools.partial(
                _flash_bwd_dq_chunk_kernel, scale=scale, safe=_SAFE_SOFTMAX, exp2=_EXP2
            ),
            out_shape=jax.ShapeDtypeStruct((b * h, nq, d), q.dtype),
            grid=(b * h, nq // blk_q, nk // kv_chunk),
            in_specs=[
                pl.BlockSpec((1, blk_q, d), lambda i, j, c: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kv_chunk, d), lambda i, j, c: (i, c, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kv_chunk, d), lambda i, j, c: (i, c, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk_q, d), lambda i, j, c: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk_q, 1), lambda i, j, c: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk_q, 1), lambda i, j, c: (i, j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, blk_q, d), lambda i, j, c: (i, j, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((blk_q, d), jnp.float32)],
            cost_estimate=cost_dq,
        )(qf, kf, vf, gf, lf, df)
    else:
        blk_q = _pick_block_bwd(nk, nq)
        dq = pl.pallas_call(
            functools.partial(_flash_bwd_dq_kernel, scale=scale, safe=_SAFE_SOFTMAX, exp2=_EXP2),
            out_shape=jax.ShapeDtypeStruct((b * h, nq, d), q.dtype),
            grid=(b * h, nq // blk_q),
            in_specs=[
                pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk_q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk_q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            cost_estimate=cost_dq,
        )(qf, kf, vf, gf, lf, df)

    blk_k = min(DKV_BLOCK_K, nk)
    # chunk must DIVIDE nq or the dkv grid floor-division silently drops the
    # tail q rows from dk/dv (caught by review at nq=640); nq % 128 == 0 is
    # dispatcher-guaranteed, so a valid chunk always exists
    chunk = next(c for c in (DKV_Q_CHUNK, 256, 128) if nq % c == 0 and c <= nq)
    assert nq % chunk == 0, (nq, chunk)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, safe=_SAFE_SOFTMAX, exp2=_EXP2),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, nk, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, nk, d), v.dtype),
        ),
        grid=(b * h, nk // blk_k, nq // chunk),
        in_specs=[
            pl.BlockSpec((1, blk_k, d), lambda i, j, c: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, d), lambda i, j, c: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, d), lambda i, j, c: (i, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, d), lambda i, j, c: (i, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, 1), lambda i, j, c: (i, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, 1), lambda i, j, c: (i, c, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, blk_k, d), lambda i, j, c: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_k, d), lambda i, j, c: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((blk_k, d), jnp.float32),
            pltpu.VMEM((blk_k, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * nq * nk * d,
            bytes_accessed=(qf.size + kf.size + vf.size + gf.size) * q.dtype.itemsize,
            transcendentals=b * h * nq * nk,
        ),
    )(kf, vf, qf, gf, lf, df)

    return (
        dq.reshape(b, h, nq, d),
        dk.reshape(b, h, nk, d),
        dv.reshape(b, h, nk, d),
    )


# ---------------------------------------------------------------------------
# public op


def _xla_reference(q, k, v, scale):
    s = jnp.einsum("bhid,bhjd->bhij", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", p.astype(v.dtype), v).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    """Exact attention, fp32 softmax. q/k/v: [B, H, N, D]; Nq, Nk must be
    multiples of the q block / lane tiling (callers guarantee this; the
    dispatcher in ops/attention.py falls back to XLA otherwise)."""
    o, _ = _flash_forward(q, k, v, scale)
    return o


def _fwd(q, k, v, scale):
    # Differentiation path (incl. the remat recompute): r2 block sizing — the
    # inference-tuned 2x block blows the 16M scoped-vmem limit by 120K inside
    # the rematted 865M train graph (see _pick_block).
    o, l = _flash_forward(q, k, v, scale, blk_cap=DEFAULT_BLOCK_Q)
    return o, (q, k, v, o, l)


def _bwd(scale, residuals, g):
    q, k, v, o, l = residuals
    return _flash_backward(q, k, v, o, l, g, scale)


flash_attention.defvjp(_fwd, _bwd)
