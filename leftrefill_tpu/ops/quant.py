"""Opt-in W8A8 int8 inference path for the MXU-heavy ops.

Measured on this v5e (scripts in /tmp, slope-corrected for harness overhead):
int8 matmuls run ~2x the bf16 rate through BOTH XLA dot and Pallas
(311+ TOPS vs ~157 TF/s at 4096^3) — contrary to the r1 assumption that int8
gave no speedup.  This is the only path past the bf16 roofline toward the
BASELINE 2 canvases/sec target.

Scheme (standard W8A8 dynamic activation quantization):
- weights: per-output-channel symmetric int8, quantized ONCE at load
  (``quantize_params``) — int8 at rest also halves weight HBM traffic;
- activations: per-tensor symmetric int8 with a dynamic abs-max scale
  computed per call (one fused reduce + round pass);
- accumulation int32, dequantized fp32 epilogue: out = acc * (s_x * s_w[c]).

Quality: the scheme is the SmoothQuant-family baseline known to hold up on
SD-class UNets, but with no real weights in this environment the quality
impact is UNVALIDATED — the path is opt-in (quant=False everywhere by
default) and must be A/B'd against bf16 before production use.

The int8 conv kernel reuses the conv3x3 structure (ops/conv.py: three
column-shifted copies — int8 halves their HBM traffic too) with an int32
VMEM accumulator.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Planner machinery shared with ops/conv.py (parameterized by element sizes).
# int8 tiles pad less than bf16 ones, so the int8 planner runs slightly
# closer to the 16MB scoped-vmem limit; lets the L0 320-ch convs use native
# channel blocks instead of padding to 384 (-20% wasted MACs).
_INT8_PLAN_KW = dict(
    widths=(128, 64, 32), x_elt=1, w_elt=1, o_elt=2,
    budget=int(11.5 * 1024 * 1024), row_floor=0,
)


# ---------------------------------------------------------------------------
# quantization helpers


def quantize_weight(w: jax.Array, axis: int = -1) -> tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8: returns (wq int8, scale f32[co])."""
    wf = jnp.asarray(w, jnp.float32)
    red = tuple(i for i in range(wf.ndim) if i != (axis % wf.ndim))
    amax = jnp.max(jnp.abs(wf), axis=red)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    shape = [1] * wf.ndim
    shape[axis % wf.ndim] = -1
    wq = jnp.clip(jnp.round(wf / scale.reshape(shape)), -127, 127).astype(jnp.int8)
    return wq, scale


def quantize_activation(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-tensor symmetric int8 with a dynamic abs-max scale (scalar f32)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def quantize_activation_rowwise(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row (per-token) symmetric int8: abs-max over the contraction dim
    only, scale [..., 1] f32.  The standard W8A8 accuracy fix for activation
    outliers (a hot token no longer collapses the resolution of every other
    row) at the cost of one extra [rows] vector in HBM — used for the dense
    sites; convs keep the per-tensor scale (their K dim is channels, where
    per-row would be per-pixel: same outlier exposure, more overhead)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return xq, scale


def dense_int8(
    xq: jax.Array,
    x_scale: jax.Array,
    wq: jax.Array,
    w_scale: jax.Array,
    bias: Optional[jax.Array] = None,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """int8 GEMM + fp32 dequant epilogue.  xq [..., K] int8, wq [K, N] int8,
    w_scale [N]; x_scale is a scalar (per-tensor) or [..., 1] (per-row) —
    both broadcast in the epilogue.  XLA's int8 dot already reaches the int8
    MXU rate, so no Pallas needed here."""
    acc = jax.lax.dot_general(
        xq, wq, dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (x_scale * w_scale)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def _dense_int8_res_mom_kernel(
    x_ref, sx_ref, w_ref, sc_ref, b_ref, res_ref, o_ref, mom_ref
):
    # K is fully resident: no accumulation scratch needed
    r = jax.lax.dot_general(
        x_ref[...], w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    r = r * sx_ref[...] * sc_ref[0] + b_ref[0]
    r = r + res_ref[...].astype(jnp.float32)
    rb = r.astype(o_ref.dtype)
    o_ref[...] = rb
    rf = rb.astype(jnp.float32)
    s1 = jnp.sum(rf, axis=0)[None, :]
    s2 = jnp.sum(rf * rf, axis=0)[None, :]
    mn = jnp.min(rf, axis=0)[None, :]
    mx = jnp.max(rf, axis=0)[None, :]
    mom = jnp.concatenate([s1, s2, mn, mx], axis=0)  # [4, N]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        mom_ref[0] = mom

    @pl.when(pl.program_id(1) != 0)
    def _acc():
        cur = mom_ref[0]
        mom_ref[0] = jnp.concatenate(
            [
                cur[0:1] + s1,
                cur[1:2] + s2,
                jnp.minimum(cur[2:3], mn),
                jnp.maximum(cur[3:4], mx),
            ],
            axis=0,
        )


def _plan_dense_rows(rows_per_sample: int, k: int, n: int) -> Optional[int]:
    """Row block for the fused dense: divides the per-sample row count (so a
    block never straddles two samples' moment slots) and keeps the resident
    working set comfortable."""
    for blk in (1024, 512, 256, 128):
        if rows_per_sample % blk == 0 and blk * (k + 3 * n) * 4 <= 10 * 1024 * 1024:
            return blk
    return None


def dense_int8_res_mom_qualifies(b: int, rows_per_sample: int, k: int, n: int) -> bool:
    from leftrefill_tpu.ops.conv import on_tpu

    return (
        on_tpu()
        and k % 128 == 0
        and n >= 128
        and _plan_dense_rows(rows_per_sample, k, n) is not None
    )


def dense_int8_res_mom(
    xq: jax.Array,       # [B, R, K] int8 (pre-quantized rows)
    sx: jax.Array,       # [B, R, 1] f32 per-row scales
    wq: jax.Array,       # [K, N] int8
    w_scale: jax.Array,  # [N]
    bias: jax.Array,     # [N]
    res: jax.Array,      # [B, R, N] residual (the transformer's + x_in)
    out_dtype=jnp.bfloat16,
) -> tuple[jax.Array, jax.Array]:
    """int8 GEMM + per-row dequant + bias + fused residual add, emitting the
    per-channel per-sample stats [B, 4, N] (Σ, Σ², min, max) of the written
    output — the SpatialTransformer proj_out + `x + x_in` site
    (attention.py:405-419), whose output feeds the next ResBlock's GroupNorm:
    with the stats emitted here, that GN skips both its moments read and its
    abs-max read.  Caller must check dense_int8_res_mom_qualifies."""
    b, r, k = xq.shape
    n = wq.shape[-1]
    blk = _plan_dense_rows(r, k, n)
    assert blk is not None, "caller must check dense_int8_res_mom_qualifies"
    x2 = xq.reshape(b * r, k)
    s2 = sx.reshape(b * r, 1)
    r2 = res.reshape(b * r, n)
    scales = w_scale.astype(jnp.float32).reshape(1, n)
    bias2 = bias.astype(jnp.float32).reshape(1, n)
    rows_per_sample_blocks = r // blk
    out, mom = pl.pallas_call(
        _dense_int8_res_mom_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b * r, n), out_dtype),
            jax.ShapeDtypeStruct((b, 4, n), jnp.float32),
        ],
        grid=(b, rows_per_sample_blocks),
        in_specs=[
            pl.BlockSpec((blk, k), lambda i, j: (i * rows_per_sample_blocks + j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), lambda i, j: (i * rows_per_sample_blocks + j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, n), lambda i, j: (i * rows_per_sample_blocks + j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((blk, n), lambda i, j: (i * rows_per_sample_blocks + j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r * k * n,
            bytes_accessed=x2.size + wq.size + 3 * b * r * n,
            transcendentals=0,
        ),
    )(x2, s2, wq, scales, bias2, r2)
    return out.reshape(b, r, n), mom


# ---------------------------------------------------------------------------
# int8 3x3 conv kernels
#
# Two kernel strategies, per-shape dispatched:
#
# - "single" (round-3, from the committed probe scripts/tpu_conv_single_probe.py,
#   105 vs 86 TOPS at the L0-like 384-ch shape): ONE padded int8 input block
#   holding the full (H+2, W+2) spatial extent; the 9 taps slice it in VMEM
#   (Mosaic relayouts the off-lane column shifts).  Kills the 3-copy HBM
#   prologue (3x write + 3x read of the activation).  Needs the whole padded
#   spatial slab per ci-block to fit VMEM — true for every UNet level at int8
#   (64x128 down to 8x16), not for the 512x1024 VAE convs (those are bf16
#   anyway).
# - "copy3": the r2 kernel (three column-shifted copies, exact column
#   blocking) — fallback for shapes whose spatial slab exceeds VMEM.

import os

_INT8_CONV_MODE = os.environ.get("LEFTREFILL_INT8_CONV", "auto")  # auto|single|copy3


def set_int8_conv_mode(mode: str) -> None:
    global _INT8_CONV_MODE
    assert mode in ("auto", "single", "copy3")
    _INT8_CONV_MODE = mode


def _ceil128(c: int) -> int:
    return -(-c // 128) * 128


def _plan_int8_single(h, w, ci, co, budget=int(11.5 * 1024 * 1024)):
    """Block plan for the single-input kernel: (blk_ci, blk_co, ci_eff, co_eff)
    or None.  Channel counts may be zero-padded to a 128 multiple on EITHER
    side (the output is sliced back); MXU cost is unchanged by padding-to-128
    (a K/N dim of 320 occupies the same 3 tiles as 384), so the score just
    minimizes total MXU tiles, then grid steps."""
    from leftrefill_tpu.ops.conv import _chan_blocks

    best, best_score = None, None
    for ci_eff in {ci, _ceil128(ci)}:
        for bci in _chan_blocks(ci_eff):
            for co_eff in {co, _ceil128(co)}:
                for bco in _chan_blocks(co_eff):
                    x_b = (h + 2) * (w + 2) * bci * 2  # int8, dbl-buffered
                    w_b = 9 * bci * bco * 2
                    acc_b = h * w * bco * 4
                    o_b = h * w * bco * 2 * 2  # bf16 out, dbl-buffered
                    if x_b + w_b + acc_b + o_b > budget:
                        continue
                    tiles = ((ci_eff // bci) * (-(-bci // 128))) * (
                        (co_eff // bco) * (-(-bco // 128))
                    )
                    score = (-tiles, bci * bco, -(ci_eff + co_eff))
                    if best_score is None or score > best_score:
                        best, best_score = (bci, bco, ci_eff, co_eff), score
    return best


def _conv_int8_single_kernel(*refs):
    xp_ref, w_ref, sc_ref, b_ref, o_ref, acc_ref = refs
    ci = pl.program_id(2)

    @pl.when(ci == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    h = o_ref.shape[1]
    wd = o_ref.shape[2]
    bci = xp_ref.shape[3]
    for dy in range(3):
        for dx in range(3):
            xs = xp_ref[0, dy : dy + h, dx : dx + wd].reshape(h * wd, bci)
            acc_ref[...] += jax.lax.dot_general(
                xs, w_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

    @pl.when(ci == pl.num_programs(2) - 1)
    def _write():
        r = acc_ref[...].astype(jnp.float32) * sc_ref[0] + b_ref[0].astype(jnp.float32)
        r = r.reshape(h, wd, o_ref.shape[3])
        o_ref[0] = r.astype(o_ref.dtype)


def conv3x3_int8_single(
    x: jax.Array,
    wq: jax.Array,
    w_scale: jax.Array,
    bias: jax.Array,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Single-input variant of conv3x3_int8 (see module comment).  Caller must
    check the plan exists."""
    xq, sx = quantize_activation(x)
    return conv3x3_int8_single_pre(xq, sx, wq, w_scale, bias, out_dtype)


def conv3x3_int8_single_pre(
    xq: jax.Array,
    sx: jax.Array,
    wq: jax.Array,
    w_scale: jax.Array,
    bias: jax.Array,
    out_dtype=jnp.bfloat16,
):
    """single-input kernel on a PRE-quantized activation."""
    b, h, wd, ci = xq.shape
    co = wq.shape[-1]
    plan = _plan_int8_single(h, wd, ci, co)
    assert plan is not None, "caller must check the plan"
    bci, bco, ci_eff, co_eff = plan

    xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, ci_eff - ci)))
    if (ci_eff, co_eff) != (ci, co):
        wq = jnp.pad(wq, ((0, 0), (0, 0), (0, ci_eff - ci), (0, co_eff - co)))
    scales = jnp.pad(sx * w_scale.astype(jnp.float32), (0, co_eff - co)).reshape(1, co_eff)
    bias2 = jnp.pad(bias.astype(jnp.float32), (0, co_eff - co)).reshape(1, co_eff)

    o_spec = pl.BlockSpec(
        (1, h, wd, bco),
        lambda bi, coj, cij: (bi, 0, 0, coj),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec(
            (1, h + 2, wd + 2, bci),
            lambda bi, coj, cij: (bi, 0, 0, cij),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (3, 3, bci, bco),
            lambda bi, coj, cij: (0, 0, cij, coj),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec((1, bco), lambda bi, coj, cij: (0, coj), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bco), lambda bi, coj, cij: (0, coj), memory_space=pltpu.VMEM),
    ]
    operands = [xp, wq, scales, bias2]

    out = pl.pallas_call(
        _conv_int8_single_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, wd, co_eff), out_dtype),
        grid=(b, co_eff // bco, ci_eff // bci),
        in_specs=in_specs,
        out_specs=o_spec,
        scratch_shapes=[pltpu.VMEM((h * wd, bco), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * b * h * wd * ci_eff * co_eff,
            bytes_accessed=xq.size + wq.size + b * h * wd * co_eff * 2,
            transcendentals=0,
        ),
    )(*operands)
    return out[..., :co] if co_eff != co else out


def _plan_int8(h, w, ci, co):
    from leftrefill_tpu.ops.conv import plan_conv_blocks

    return plan_conv_blocks(h, w, ci, co, **{**_INT8_PLAN_KW, "o_elt": 2})


# Tap accumulation: 9 K=blk_ci dots ("sum9").  Two deeper-K variants were
# built and measured NEGATIVE, then removed in r4/r5: "concat" (one
# K=9*blk_ci dot) blew scoped VMEM by 2.25M at L0 320ch
# (bench_logs_r4/bench_taps_concat_r4.log); "dy3" (3 dots, K=3*blk_ci)
# measured 0.7144 vs the 0.7153 ddim-50 epoch
# (bench_logs_r4/bench_taps_dy3_r4b.log) — the im2col concat per grid step
# costs more than the deeper contraction buys.


def _conv_int8_kernel(*refs):
    x0, x1, x2, w_ref, sc_ref, b_ref, o_ref, acc_ref = refs
    ci = pl.program_id(3)

    @pl.when(ci == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    h = o_ref.shape[1]
    blk_w = o_ref.shape[2]
    blk_ci = x0.shape[3]
    for dx, xr in enumerate((x0, x1, x2)):
        for dy in range(3):
            xs = xr[0, dy : dy + h].reshape(h * blk_w, blk_ci)
            acc_ref[...] += jax.lax.dot_general(
                xs, w_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

    @pl.when(ci == pl.num_programs(3) - 1)
    def _write():
        # dequant: sc_ref holds s_x * w_scale[c] (fp32), bias folded separately
        r = acc_ref[...].astype(jnp.float32) * sc_ref[0] + b_ref[0].astype(jnp.float32)
        r = r.reshape(h, blk_w, o_ref.shape[3])
        o_ref[0] = r.astype(o_ref.dtype)


def conv3x3_int8(
    x: jax.Array,
    wq: jax.Array,
    w_scale: jax.Array,
    bias: jax.Array,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """3x3 stride-1 pad-1 conv with int8 weights (HWIO) + dynamic int8
    activations; NHWC.  Dispatches single-input vs 3-copy per shape (see the
    kernel section comment).  Caller must check conv3x3_int8_qualifies."""
    b, h, wd, ci = x.shape
    co = wq.shape[-1]
    mode = _INT8_CONV_MODE
    if mode == "auto":
        # measured on v5e (scripts/tpu_r3_convshapes.py, /tmp logs r3): with
        # the activation-quantize pass included on BOTH sides, copy3 wins or
        # ties at every UNet shape where it has a plan (e.g. L0 320ch: 0.326
        # vs 0.431 ms — the r2 probe's +19% for single timed copy3 WITH
        # quantization but single WITHOUT it).  single's role is the small
        # 8x16 levels where copy3 has no aligned column plan.
        mode = "copy3" if _plan_int8(h, wd, ci, co) is not None else "single"
    if mode == "single" and _plan_int8_single(h, wd, ci, co) is not None:
        return conv3x3_int8_single(x, wq, w_scale, bias, out_dtype)
    return conv3x3_int8_copy3(x, wq, w_scale, bias, out_dtype)


def conv3x3_int8_copy3(
    x: jax.Array,
    wq: jax.Array,
    w_scale: jax.Array,
    bias: jax.Array,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """3-copy int8 conv (r2 kernel): three column-shifted input copies."""
    xq, sx = quantize_activation(x)
    return conv3x3_int8_copy3_pre(xq, sx, wq, w_scale, bias, out_dtype)


def conv3x3_int8_copy3_pre(
    xq: jax.Array,
    sx: jax.Array,
    wq: jax.Array,
    w_scale: jax.Array,
    bias: jax.Array,
    out_dtype=jnp.bfloat16,
):
    """copy3 kernel on a PRE-quantized activation (xq int8, sx scalar f32) —
    lets the fused GN+SiLU+quantize prologue feed the conv directly."""
    b, h, wd, ci = xq.shape
    co = wq.shape[-1]
    plan = _plan_int8(h, wd, ci, co)
    assert plan is not None, "caller must check the plan"
    (blk_w, blk_ci, blk_co), ci_eff = plan

    cpad = ci_eff - ci
    xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, cpad)))
    if cpad:
        wq = jnp.pad(wq, ((0, 0), (0, 0), (0, cpad), (0, 0)))
    x0 = xp[:, :, 0:wd]
    x1 = xp[:, :, 1 : wd + 1]
    x2 = xp[:, :, 2 : wd + 2]
    scales = (sx * w_scale.astype(jnp.float32)).reshape(1, co)
    bias2 = bias.astype(jnp.float32).reshape(1, co)

    grid = (b, co // blk_co, wd // blk_w, ci_eff // blk_ci)
    x_spec = pl.BlockSpec(
        (1, h + 2, blk_w, blk_ci),
        lambda bi, coj, wj, cij: (bi, 0, wj, cij),
        memory_space=pltpu.VMEM,
    )
    o_spec = pl.BlockSpec(
        (1, h, blk_w, blk_co),
        lambda bi, coj, wj, cij: (bi, 0, wj, coj),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        x_spec,
        x_spec,
        x_spec,
        pl.BlockSpec(
            (3, 3, blk_ci, blk_co),
            lambda bi, coj, wj, cij: (0, 0, cij, coj),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, blk_co), lambda bi, coj, wj, cij: (0, coj), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (1, blk_co), lambda bi, coj, wj, cij: (0, coj), memory_space=pltpu.VMEM
        ),
    ]
    operands = [x0, x1, x2, wq, scales, bias2]
    out = pl.pallas_call(
        _conv_int8_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, wd, co), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        scratch_shapes=[pltpu.VMEM((h * blk_w, blk_co), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * b * h * wd * ci * co,
            bytes_accessed=3 * xq.size + wq.size + b * h * wd * co * 2,
            transcendentals=0,
        ),
    )(*operands)
    return out


def conv3x3_int8_qualifies(h: int, w: int, ci: int, co: int) -> bool:
    from leftrefill_tpu.ops.conv import on_tpu

    # h*w >= 128 (not 256): the single-input kernel covers the 8x16 UNet
    # level (h*w = 128), which previously fell back to a per-call
    # weight-dequantize + XLA conv
    return (
        on_tpu() and ci >= 64 and co >= 64 and h * w >= 128
        and (
            _plan_int8(h, w, ci, co) is not None
            or _plan_int8_single(h, w, ci, co) is not None
        )
    )


def int8_xla_conv_enabled() -> bool:
    """Opt-in gate for routing plan-less int8 convs through XLA's native
    s8xs8->s32 conv lowering instead of the weight-dequantize fp fallback.
    Off by default until the per-shape TPU A/B confirms a win (r2 measured
    ~400 TOPS for XLA int8 dots; the conv emitter is unverified)."""
    return os.environ.get("LEFTREFILL_INT8_XLA_CONV", "0") == "1"


def conv_int8_xla(
    x: jax.Array,
    wq: jax.Array,
    w_scale: jax.Array,
    bias: jax.Array,
    strides: tuple[int, int] = (1, 1),
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """W8A8 conv through XLA (any 3x3 shape/stride, torch padding=1): covers
    the stride-2 Downsample (openaimodel.py:133-159) and levels without a
    Pallas VMEM plan.  int32 accumulation on the int8 MXU path."""
    xq, sx = quantize_activation(x)
    y = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=strides,
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * (sx * w_scale.astype(jnp.float32)) + bias.astype(
        jnp.float32
    )
    return out.astype(out_dtype)


def conv3x3_int8_reference(x, wq, w_scale, bias):
    """Emulated int8 conv (XLA, fp32 math on the quantized values) — the
    numeric oracle for the kernel."""
    xq, sx = quantize_activation(x)
    out = jax.lax.conv_general_dilated(
        xq.astype(jnp.float32),
        wq.astype(jnp.float32),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out * (sx * w_scale.astype(jnp.float32)) + bias.astype(jnp.float32)


# ---------------------------------------------------------------------------
# fused GroupNorm+SiLU+quantize prologue (round-3)
#
# Why: the optimized HLO of an int8 ResBlock (scripts/tpu_r3_hlo_inspect.py)
# showed XLA bouncing layouts between its GN/SiLU fusions (materialized fp32
# tensors in {2,1,3,0}) and the Pallas convs' required {3,2,1,0} operands —
# ~13 full-tensor copies per block, the bulk of the measured ~3.6ms of
# "glue" around the conv kernels.  Moving the whole normalize+SiLU+quantize
# chain into one layout-stable Pallas kernel leaves XLA only scalar/vector
# reductions (GN statistics, the quantization amax), which materialize
# nothing.  The emb-add and scale-shift of the ResBlock fold into the
# per-(batch, channel) affine algebraically (see gn_silu_conv3x3_int8).


def _affine_silu_quant_kernel(x_ref, a_ref, b_ref, s_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)  # [blk_h, blk_w, C]
    a = a_ref[0, 0]  # [C] -> broadcast
    bb = b_ref[0, 0]
    y = x * a[None, None] + bb[None, None]
    y = y * jax.nn.sigmoid(y)  # silu
    q = jnp.clip(jnp.round(y * s_ref[0, 0]), -127, 127)
    o_ref[0] = q.astype(jnp.int8)


def _plan_affine_blocks(h: int, w: int, c: int, budget_elems: int = 192 * 1024):
    """Largest (blk_h, blk_w) with blk_h*blk_w*c <= budget (one fp32 copy of
    the block ~= budget*4 bytes; Mosaic holds ~3 live fp32 temps + the bf16 in
    and int8 out, so 192K elems keeps the scoped stack well under the 16M
    limit — the unplanned full-H block OOM'd at 20.9M on L0 shapes).
    blk_w is the sublane dim: multiple of 8 or full; blk_h any divisor."""
    limit = max(budget_elems // c, 1)
    blk_w = w
    while blk_w > limit and blk_w % 2 == 0 and (blk_w // 2) % 8 == 0:
        blk_w //= 2
    blk_h = 1
    for cand in range(h, 0, -1):
        if h % cand == 0 and cand * blk_w <= limit:
            blk_h = cand
            break
    return blk_h, blk_w


def affine_silu_quant(
    x: jax.Array,  # [B, H, W, C] bf16/f32
    a: jax.Array,  # [B, C] f32 (rstd * gamma, folded)
    bb: jax.Array,  # [B, C] f32 (beta - mean*rstd*gamma, folded)
    inv_scale: jax.Array,  # scalar f32 (127/amax)
) -> jax.Array:
    """int8( silu(x*a + bb) * inv_scale ), one layout-stable Pallas pass."""
    b, h, w, c = x.shape
    blk_h, blk_w = _plan_affine_blocks(h, w, c)
    s2 = jnp.asarray(inv_scale, jnp.float32).reshape(1, 1)
    # [B,1,C] carriers: a (1,C) block on a [B,C] array violates Mosaic's
    # last-two-dims rule (sublane dim 1 != array dim 2)
    a3 = a.reshape(b, 1, c)
    bb3 = bb.reshape(b, 1, c)
    return pl.pallas_call(
        _affine_silu_quant_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.int8),
        grid=(b, h // blk_h, w // blk_w),
        in_specs=[
            pl.BlockSpec((1, blk_h, blk_w, c), lambda i, j, k: (i, j, k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j, k: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j, k: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_h, blk_w, c), lambda i, j, k: (i, j, k, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=8 * x.size, bytes_accessed=x.size * x.dtype.itemsize + x.size,
            transcendentals=x.size,
        ),
    )(x, a3, bb3, s2)


def _plan_ln_rows(r: int, c: int) -> Optional[int]:
    """Row-block size for the fused LN+quant kernel: multiple of 32 (the int8
    sublane tile) dividing r, sized so the resident fp32 compute tile stays
    well under scoped VMEM."""
    # ~22 bytes/elem live in VMEM (bf16 in+out + int8 out, double-buffered,
    # plus ~3 fp32 compute temps on the scoped stack) — keep blocks under
    # ~8MB of that footprint
    for blk in (512, 256, 128, 64, 32):
        if r % blk == 0 and blk * c * 22 <= 8 * 1024 * 1024:
            return blk
    return None


def ln_quant_qualifies(r: int, c: int) -> bool:
    from leftrefill_tpu.ops.conv import on_tpu

    return on_tpu() and _plan_ln_rows(r, c) is not None


def _ln_quant_kernel(*refs, eps, norm_out):
    if norm_out:
        x_ref, g_ref, b_ref, xn_ref, xq_ref, sc_ref = refs
    else:
        x_ref, g_ref, b_ref, xq_ref, sc_ref = refs
        xn_ref = None
    xf = x_ref[...].astype(jnp.float32)                       # [blk_r, C]
    m = jnp.mean(xf, axis=-1, keepdims=True)
    d = xf - m
    v = jnp.mean(d * d, axis=-1, keepdims=True)
    y = d * jax.lax.rsqrt(v + eps) * g_ref[0].astype(jnp.float32) + b_ref[
        0
    ].astype(jnp.float32)
    if xn_ref is not None:
        xn_ref[...] = y.astype(xn_ref.dtype)
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)        # [blk_r, 1]
    scale = jnp.maximum(amax, 1e-8) / 127.0
    xq_ref[...] = jnp.clip(jnp.round(y / scale), -127, 127).astype(jnp.int8)
    sc_ref[...] = scale


def ln_quant_rowwise(
    x: jax.Array,       # [..., C] bf16/f32
    gamma: jax.Array,   # [C]
    beta: jax.Array,    # [C]
    eps: float = 1e-5,
    norm_out: bool = True,
) -> tuple[Optional[jax.Array], jax.Array, jax.Array]:
    """Fused fp32-island LayerNorm + per-row symmetric int8 quantization:
    one HBM read of x, writes (x_norm, xq, scales) — replaces the unfused
    LayerNormF32 -> quantize_activation_rowwise chain (2 extra full-tensor
    HBM reads + layout-copy XLA fusions) at the transformer dense sites
    (attention.py:253-283 prenorms).  The quantized values come from the
    fp32 normalize (no intermediate bf16 round), strictly finer than the
    unfused chain.  Caller must check ln_quant_qualifies.

    Inference-only (the int8 consumers are non-differentiable); training
    paths run quant=False and never reach it."""
    *lead, c = x.shape
    r = int(np.prod(lead))
    blk = _plan_ln_rows(r, c)
    assert blk is not None, "caller must check ln_quant_qualifies"
    x2 = x.reshape(r, c)
    g2 = gamma.astype(jnp.float32).reshape(1, c)
    b2 = beta.astype(jnp.float32).reshape(1, c)
    out_dtype = x.dtype if x.dtype in (jnp.bfloat16, jnp.float32) else jnp.bfloat16
    big = pl.BlockSpec((blk, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((r, c), jnp.int8),
        jax.ShapeDtypeStruct((r, 1), jnp.float32),
    ]
    out_specs = [big, pl.BlockSpec((blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    if norm_out:
        out_shape.insert(0, jax.ShapeDtypeStruct((r, c), out_dtype))
        out_specs.insert(0, big)
    outs = pl.pallas_call(
        functools.partial(_ln_quant_kernel, eps=eps, norm_out=norm_out),
        out_shape=out_shape,
        grid=(r // blk,),
        in_specs=[
            big,
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        cost_estimate=pl.CostEstimate(
            flops=10 * x.size,
            bytes_accessed=x.size * x.dtype.itemsize * (2 if norm_out else 1) + x.size,
            transcendentals=0,
        ),
    )(x2, g2, b2)
    xn = outs[0].reshape(*lead, c) if norm_out else None
    xq, sc = outs[-2], outs[-1]
    return xn, xq.reshape(*lead, c), sc.reshape(*lead, 1)


def _gn_affine_quant_kernel(*refs, norm_out):
    if norm_out:
        x_ref, a_ref, b_ref, xn_ref, xq_ref, sc_ref = refs
    else:
        x_ref, a_ref, b_ref, xq_ref, sc_ref = refs
        xn_ref = None
    x = x_ref[0].astype(jnp.float32)  # [blk_h, blk_w, C]
    a = a_ref[0, 0]  # [C]
    bb = b_ref[0, 0]
    y = x * a[None, None] + bb[None, None]
    if xn_ref is not None:
        xn_ref[0] = y.astype(xn_ref.dtype)
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)       # [blk_h, blk_w, 1]
    scale = jnp.maximum(amax, 1e-8) / 127.0
    xq_ref[0] = jnp.clip(jnp.round(y / scale), -127, 127).astype(jnp.int8)
    sc_ref[0] = scale


def gn_quant_qualifies(h: int, w: int, c: int, num_groups: int = 32) -> bool:
    from leftrefill_tpu.ops.conv import on_tpu

    return on_tpu() and c % num_groups == 0 and w % 8 == 0


def gn_quant_rowwise(
    x: jax.Array,       # [B, H, W, C] bf16
    gamma: jax.Array,   # [C]
    beta: jax.Array,    # [C]
    *,
    num_groups: int = 32,
    eps: float = 1e-6,
    norm_out: bool = True,
) -> tuple[Optional[jax.Array], jax.Array, jax.Array]:
    """Fused GroupNorm32 + per-row (per-pixel) int8 quantization for the
    SpatialTransformer norm -> proj_in site (attention.py:355-363): GN
    statistics fold to per-channel affine vectors (fp32, _gn_affine_ab), one
    Pallas pass then writes (x_norm, xq, scales [B,H,W,1]) — replacing the
    GN pass + the two quantize reads.  Caller must check gn_quant_qualifies.

    Inference-only, like ln_quant_rowwise."""
    b, h, w, c = x.shape
    xf32 = x.astype(jnp.float32)
    m_c = jnp.mean(xf32, axis=(1, 2))
    q_c = jnp.mean(xf32 * xf32, axis=(1, 2))
    a, bb = _gn_affine_ab(m_c, q_c, gamma, beta, num_groups, eps, None, None)
    blk_h, blk_w = _plan_affine_blocks(h, w, c)
    a3 = a.reshape(b, 1, c)
    bb3 = bb.reshape(b, 1, c)
    big = pl.BlockSpec(
        (1, blk_h, blk_w, c), lambda i, j, k: (i, j, k, 0), memory_space=pltpu.VMEM
    )
    out_shape = [
        jax.ShapeDtypeStruct((b, h, w, c), jnp.int8),
        jax.ShapeDtypeStruct((b, h, w, 1), jnp.float32),
    ]
    out_specs = [
        big,
        pl.BlockSpec(
            (1, blk_h, blk_w, 1), lambda i, j, k: (i, j, k, 0), memory_space=pltpu.VMEM
        ),
    ]
    if norm_out:
        out_shape.insert(0, jax.ShapeDtypeStruct((b, h, w, c), x.dtype))
        out_specs.insert(0, big)
    outs = pl.pallas_call(
        functools.partial(_gn_affine_quant_kernel, norm_out=norm_out),
        out_shape=out_shape,
        grid=(b, h // blk_h, w // blk_w),
        in_specs=[
            big,
            pl.BlockSpec((1, 1, c), lambda i, j, k: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j, k: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        cost_estimate=pl.CostEstimate(
            flops=6 * x.size,
            bytes_accessed=x.size * x.dtype.itemsize * (2 if norm_out else 1) + x.size,
            transcendentals=0,
        ),
    )(x, a3, bb3)
    return (outs[0] if norm_out else None), outs[-2], outs[-1]


def _gn_affine_ab(
    m_c: jax.Array,        # [B, C] per-channel spatial mean
    q_c: jax.Array,        # [B, C] per-channel spatial E[x^2]
    gamma: jax.Array,
    beta: jax.Array,
    num_groups: int,
    eps: float,
    emb: Optional[jax.Array],
    scale_shift: Optional[tuple],
) -> tuple[jax.Array, jax.Array]:
    """GroupNorm32(+emb-add | scale-shift) folded to per-channel affine
    vectors (a, bb): normalize+affine == x*a + bb.  Operating on the
    per-channel moments means the spatial tensor may live in HBM as several
    channel-concatenated parts (decoder skip cats) — moments are computed
    per part and concatenated here, which is exact: grouping happens on the
    [B, C] vectors, not the spatial data."""
    b, c = m_c.shape
    g = num_groups
    e_c = emb.astype(jnp.float32) if emb is not None else jnp.zeros_like(m_c)
    mg = jnp.mean((m_c + e_c).reshape(b, g, c // g), axis=-1)            # [B, g]
    q2 = q_c + 2.0 * e_c * m_c + e_c * e_c
    vg = jnp.mean(q2.reshape(b, g, c // g), axis=-1) - mg * mg           # [B, g]
    rstd = jax.lax.rsqrt(vg + eps)                                       # [B, g]
    rstd_c = jnp.repeat(rstd, c // g, axis=-1)                           # [B, C]
    mg_c = jnp.repeat(mg, c // g, axis=-1)
    gmm = gamma.astype(jnp.float32)[None]
    a = rstd_c * gmm                                                     # [B, C]
    bb = (e_c - mg_c) * a + beta.astype(jnp.float32)[None]
    if scale_shift is not None:
        s_, t_ = scale_shift
        s_ = 1.0 + s_.astype(jnp.float32)
        a = a * s_
        bb = bb * s_ + t_.astype(jnp.float32)
    return a, bb


def _conv3x3_int8_pre(xq, sx, wq, w_scale, bias, out_dtype):
    """copy3-preferred kernel dispatch on a PRE-quantized activation (the
    kernel choice mirrors conv3x3_int8: copy3 wherever it has a plan)."""
    b, h, wd, ci = xq.shape
    co = wq.shape[-1]
    if _plan_int8(h, wd, ci, co) is not None:
        return conv3x3_int8_copy3_pre(xq, sx, wq, w_scale, bias, out_dtype)
    return conv3x3_int8_single_pre(xq, sx, wq, w_scale, bias, out_dtype)


def gn_silu_conv3x3_int8(
    x: jax.Array,          # [B, H, W, C] bf16 (pre-GN activation)
    gamma: jax.Array,      # [C] GroupNorm scale
    beta: jax.Array,       # [C] GroupNorm bias
    wq: jax.Array,         # [3,3,C,CO] int8
    w_scale: jax.Array,    # [CO]
    bias: jax.Array,       # [CO]
    *,
    num_groups: int = 32,
    eps: float = 1e-5,
    emb: Optional[jax.Array] = None,          # [B, C]: h+emb BEFORE the GN
    scale_shift: Optional[tuple] = None,      # (s [B,C], t [B,C]): GN(h)*(1+s)+t
    out_dtype=jnp.bfloat16,
):
    """Fused GroupNorm32 + (emb-add | scale-shift) + SiLU + int8-quantize +
    3x3 int8 conv — the ResBlock conv stack (openaimodel.py:162-274) with the
    fp32-statistics island intact.

    The emb-add folds into the statistics without materializing h+emb:
    with e per (b,c) constant over space, group mean' = mean_g(m_c + e_c) and
    E[(h+e)^2] = q_c + 2 e_c m_c + e_c^2 from the per-channel spatial moments
    (m_c, q_c) — two tiny [B,C] reductions of x are the only XLA work.

    Epilogue variants (fused residual add, per-channel output-stats emission
    for downstream GN consumers, and a split-kernel virtual-concat form) were
    built and measured end-to-end NEGATIVE or neutral on the r4 six-flag
    bisect (RESADD -1.3%, CONV_MOMENTS -0.13%, SPLIT_CAT -0.06% vs the
    0.7153 ddim-50 epoch, bench_logs_r4) — removed in r5."""
    b, h, w, c = x.shape
    xf32 = x.astype(jnp.float32)
    m_c = jnp.mean(xf32, axis=(1, 2))            # [B, C] spatial mean
    q_c = jnp.mean(xf32 * xf32, axis=(1, 2))     # [B, C] spatial E[x^2]
    a, bb = _gn_affine_ab(m_c, q_c, gamma, beta, num_groups, eps, emb, scale_shift)

    # quantization scale: amax of silu(x*a+bb) — one fused XLA reduce
    # (no materialized tensor; silu is monotone-ish but not, so reduce
    # the real value)
    y = xf32 * a[:, None, None, :] + bb[:, None, None, :]
    amax = jnp.max(jnp.abs(y * jax.nn.sigmoid(y)))
    scale = jnp.maximum(amax, 1e-8) / 127.0

    xq = affine_silu_quant(x, a, bb, 1.0 / scale)
    return _conv3x3_int8_pre(xq, scale, wq, w_scale, bias, out_dtype)


def gn_silu_conv3x3_int8_qualifies(h: int, w: int, ci: int, co: int, num_groups: int = 32) -> bool:
    return conv3x3_int8_qualifies(h, w, ci, co) and ci % num_groups == 0


# ---------------------------------------------------------------------------
# parameter-tree quantization


def quantize_params_like(q_struct, params):
    """Build the quantized parameter tree matching a quant model's structure.

    q_struct: the quant model's param structure (e.g. from
    jax.eval_shape(qmodel.init, ...)); wherever it declares a
    ``kernel_scale``, the fp kernel from ``params`` is replaced by its
    per-output-channel int8 quantization and the scale filled in.  All other
    leaves are taken from ``params`` unchanged."""

    def rec(qs, ps):
        if not isinstance(qs, dict):
            return ps
        out = {}
        for k, v in qs.items():
            if k == "kernel_scale":
                continue  # produced alongside 'kernel'
            if k == "kernel" and "kernel_scale" in qs:
                wq, scale = quantize_weight(ps[k], axis=-1)
                out["kernel"] = wq
                out["kernel_scale"] = scale
            else:
                out[k] = rec(v, ps[k])
        return out

    return rec(q_struct, params)
