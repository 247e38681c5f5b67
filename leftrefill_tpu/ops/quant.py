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


def dense_int8(
    xq: jax.Array,
    x_scale: jax.Array,
    wq: jax.Array,
    w_scale: jax.Array,
    bias: Optional[jax.Array] = None,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """int8 GEMM + fp32 dequant epilogue.  xq [..., K] int8, wq [K, N] int8,
    w_scale [N].  XLA's int8 dot already reaches the int8 MXU rate, so no
    Pallas needed here."""
    acc = jax.lax.dot_general(
        xq, wq, dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * (x_scale * w_scale)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


# ---------------------------------------------------------------------------
# int8 3x3 conv kernel (structure mirrors ops/conv.py)


def _plan_int8(h, w, ci, co):
    from leftrefill_tpu.ops.conv import plan_conv_blocks

    return plan_conv_blocks(h, w, ci, co, **_INT8_PLAN_KW)


def _conv_int8_kernel(x0, x1, x2, w_ref, sc_ref, b_ref, o_ref, acc_ref):
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
        o_ref[0] = r.reshape(h, blk_w, o_ref.shape[3]).astype(o_ref.dtype)


def conv3x3_int8(
    x: jax.Array,
    wq: jax.Array,
    w_scale: jax.Array,
    bias: jax.Array,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """3x3 stride-1 pad-1 conv with int8 weights (HWIO) + dynamic int8
    activations; NHWC.  Caller must check conv3x3_int8_qualifies."""
    b, h, wd, ci = x.shape
    co = wq.shape[-1]
    plan = _plan_int8(h, wd, ci, co)
    assert plan is not None, "caller must check conv3x3_int8_qualifies"
    (blk_w, blk_ci, blk_co), ci_eff = plan

    xq, sx = quantize_activation(x)
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
    out = pl.pallas_call(
        _conv_int8_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, wd, co), out_dtype),
        grid=grid,
        in_specs=[
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
        ],
        out_specs=pl.BlockSpec(
            (1, h, blk_w, blk_co),
            lambda bi, coj, wj, cij: (bi, 0, wj, coj),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((h * blk_w, blk_co), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * b * h * wd * ci * co,
            bytes_accessed=3 * x.size + wq.size + b * h * wd * co * 2,
            transcendentals=0,
        ),
    )(x0, x1, x2, wq, scales, bias2)
    return out


def conv3x3_int8_qualifies(h: int, w: int, ci: int, co: int) -> bool:
    from leftrefill_tpu.ops.conv import on_tpu

    return (
        on_tpu() and ci >= 64 and co >= 64 and h * w >= 256
        and _plan_int8(h, w, ci, co) is not None
    )


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
