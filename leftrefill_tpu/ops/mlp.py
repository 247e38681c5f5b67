"""Fused GEGLU feed-forward Pallas kernel.

Why: the transformer FF is the UNet's second-largest time sink after ds1
self-attention (~5.2 ms of the 30.4 ms int8 b2 forward, measured
scripts/tpu_r3_split3.py) and it is HBM-bound, not MXU-bound: the GEGLU
intermediates ([B*N, 2*4*dim] — 16384 x 2560 per ds1 block) are materialized
to HBM between the two XLA dots (~350 MB of traffic per ds1 FF).  This kernel
streams weight chunks through VMEM and keeps every intermediate on-chip:

    for chunk c of the inner dim:                       (grid minor axis)
        v = x @ W1[:, c] + b1[c]        # value half
        g = x @ W1[:, I + c] + b1[I+c]  # gate half
        h = v * gelu_erf(g)             # exact erf gelu (torch F.gelu)
        acc += h @ W2[c, :]
    out = acc + b2                                       (last chunk)

The value/gate column pairing is addressed via two BlockSpecs over the SAME
packed [din, 2I] weight array (index maps c and c + n_chunks) — no slicing
copies.  Reference semantics: GEGLU + Linear, attention.py:51-78.

int8 (W8A8) variant: int8 x / W1 / W2 with fp32 dequant between stages; h is
re-quantized in-kernel with a per-row-per-chunk dynamic scale (strictly finer
than the XLA path's per-row scale over the whole inner dim).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BUDGET = int(11.0 * 1024 * 1024)
# A/B switch for benchmarking the fused path against the XLA dense chain
_GEGLU_FUSED = os.environ.get("LEFTREFILL_GEGLU_FUSED", "1") == "1"


def set_geglu_fused(on: bool) -> None:
    global _GEGLU_FUSED
    _GEGLU_FUSED = bool(on)


def _plan(r: int, din: int, inner: int, dout: int, x_elt: int, w_elt: int):
    """(blk_r, ci) under the VMEM budget, or None."""
    best = None
    for blk_r in (512, 256, 128):
        if r % blk_r:
            continue
        for ci in (1280, 1024, 640, 512, 256, 128):
            if inner % ci:
                continue
            x_b = blk_r * din * x_elt * 2
            w1_b = 2 * din * ci * w_elt * 2
            w2_b = ci * dout * w_elt * 2
            acc_b = blk_r * dout * 4
            o_b = blk_r * dout * 2 * 2
            inter_b = 3 * blk_r * ci * 4
            if x_b + w1_b + w2_b + acc_b + o_b + inter_b <= _BUDGET:
                cand = (blk_r, ci)
                if best is None or cand > best:
                    best = cand
    return best


def _erf_approx(x):
    """Mosaic-safe erf (the TPU Pallas lowering has no erf primitive):
    Abramowitz & Stegun 7.1.26 — |err| <= 1.5e-7, i.e. exact at f32/bf16
    working precision.  One exp + a degree-5 polynomial on the VPU."""
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_erf(x):
    return 0.5 * x * (1.0 + _erf_approx(x * (2.0 ** -0.5)))


def _geglu_kernel(*refs):
    (x_ref, w1v_ref, w1g_ref, b1v_ref, b1g_ref, w2_ref, b2_ref,
     o_ref, acc_ref) = refs
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    v = jax.lax.dot_general(
        x, w1v_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1v_ref[0]
    g = jax.lax.dot_general(
        x, w1g_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1g_ref[0]
    h = v * _gelu_erf(g)
    acc_ref[...] += jax.lax.dot_general(
        h.astype(x.dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(c == pl.num_programs(1) - 1)
    def _write():
        r = acc_ref[...] + b2_ref[0]
        o_ref[...] = r.astype(o_ref.dtype)


def _geglu_pallas(
    x: jax.Array,  # [R, din]
    w1: jax.Array,  # [din, 2*inner] packed [value | gate]
    b1: jax.Array,  # [2*inner]
    w2: jax.Array,  # [inner, dout]
    b2: jax.Array,  # [dout]
    out_dtype,
) -> jax.Array:
    r, din = x.shape
    inner, dout = w2.shape
    plan = _plan(r, din, inner, dout, x_elt=2, w_elt=2)
    assert plan is not None, "caller must check geglu_fused_qualifies"
    blk_r, ci = plan
    nc = inner // ci

    x = x.astype(jnp.bfloat16)
    w1 = w1.astype(jnp.bfloat16)
    w2 = w2.astype(jnp.bfloat16)
    b1f = b1.astype(jnp.float32).reshape(1, 2 * inner)
    b2f = b2.astype(jnp.float32).reshape(1, dout)

    o_spec = pl.BlockSpec((blk_r, dout), lambda i, c: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((blk_r, din), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((din, ci), lambda i, c: (0, c), memory_space=pltpu.VMEM),
        pl.BlockSpec((din, ci), lambda i, c, nc=nc: (0, c + nc), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ci), lambda i, c: (0, c), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ci), lambda i, c, nc=nc: (0, c + nc), memory_space=pltpu.VMEM),
        pl.BlockSpec((ci, dout), lambda i, c: (c, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dout), lambda i, c: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x, w1, w1, b1f, b1f, w2, b2f]
    return pl.pallas_call(
        _geglu_kernel,
        out_shape=jax.ShapeDtypeStruct((r, dout), out_dtype),
        grid=(r // blk_r, nc),
        in_specs=in_specs,
        out_specs=o_spec,
        scratch_shapes=[pltpu.VMEM((blk_r, dout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * r * din * 2 * inner + 2 * r * inner * dout,
            bytes_accessed=x.size * 2 + w1.size * 2 + w2.size * 2 + r * dout * 2,
            transcendentals=r * inner,
        ),
    )(*operands)


def _geglu_xla_math(x, w1, b1, w2, b2):
    """The kernel's math in plain XLA (bf16 matmuls, fp32 exact erf-gelu) —
    the differentiable twin used for the custom VJP."""
    cd = jnp.bfloat16 if x.dtype != jnp.float32 else jnp.float32
    xg = x.astype(cd) @ w1.astype(cd) + b1.astype(cd)
    val, gate = jnp.split(xg, 2, axis=-1)
    h = val.astype(jnp.float32) * jax.nn.gelu(
        gate.astype(jnp.float32), approximate=False
    )
    out = h.astype(cd) @ w2.astype(cd) + b2.astype(cd)
    return out.astype(x.dtype)


@jax.custom_vjp
def geglu_fused(x, w1, b1, w2, b2):
    """Fused GEGLU: Pallas forward (out dtype = x.dtype), XLA-math VJP so the
    training path differentiates through it (same pattern as conv3x3_op)."""
    return _geglu_pallas(x, w1, b1, w2, b2, out_dtype=x.dtype)


def _geglu_fwd(x, w1, b1, w2, b2):
    return _geglu_pallas(x, w1, b1, w2, b2, out_dtype=x.dtype), (x, w1, b1, w2, b2)


def _geglu_bwd(res, g):
    _, vjp = jax.vjp(_geglu_xla_math, *res)
    return vjp(g.astype(res[0].dtype))


geglu_fused.defvjp(_geglu_fwd, _geglu_bwd)


# A fused-residual epilogue variant (geglu_fused_res / res= on the int8
# kernel, env gates LEFTREFILL_FUSED_FFRES / LEFTREFILL_FUSED_RESADD) was
# built and measured end-to-end NEGATIVE on the r4 six-flag bisect
# (bench_logs_r4: ffres -1.0%, resadd -1.3% vs the 0.7153 ddim-50 epoch —
# kernel-level wins eaten by worse XLA scheduling around the call).
# Removed in r5; the residual is a plain XLA add at every call site.


def _geglu_int8_kernel(*refs, w2_bf16: bool):
    (x_ref, sx_ref, w1v_ref, s1v_ref, w1g_ref, s1g_ref,
     b1v_ref, b1g_ref, w2_ref, s2_ref, b2_ref,
     o_ref, acc_ref) = refs
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]           # int8 [blk_r, din]
    sx = sx_ref[...]         # f32 [blk_r, 1]
    v32 = jax.lax.dot_general(
        x, w1v_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    g32 = jax.lax.dot_general(
        x, w1g_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    v = v32.astype(jnp.float32) * (sx * s1v_ref[0]) + b1v_ref[0]
    g = g32.astype(jnp.float32) * (sx * s1g_ref[0]) + b1g_ref[0]
    h = v * _gelu_erf(g)
    if w2_bf16:
        # bf16 second GEMM on the raw int8 weight values (ints <= 127 are
        # exact in bf16; the per-column w2 scale folds into the epilogue):
        # skips the per-row-per-chunk requant VPU chain (max/div/round/clip)
        # at the cost of bf16 MXU rate on ~25% of the FLOPs — measured
        # faster AND more accurate (no second activation quantization).
        acc_ref[...] += jax.lax.dot_general(
            h.astype(jnp.bfloat16), w2_ref[...].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        # per-row-per-chunk dynamic requantization for the second int8 GEMM
        sh = jnp.maximum(jnp.max(jnp.abs(h), axis=-1, keepdims=True), 1e-8) / 127.0
        hq = jnp.clip(jnp.round(h / sh), -127, 127).astype(jnp.int8)
        acc32 = jax.lax.dot_general(
            hq, w2_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc_ref[...] += acc32.astype(jnp.float32) * (sh * s2_ref[0])

    @pl.when(c == pl.num_programs(1) - 1)
    def _write():
        if w2_bf16:
            r = acc_ref[...] * s2_ref[0] + b2_ref[0]
        else:
            r = acc_ref[...] + b2_ref[0]
        o_ref[...] = r.astype(o_ref.dtype)


def geglu_fused_int8(
    x: jax.Array,        # [R, din] float
    w1q: jax.Array,      # [din, 2*inner] int8
    w1_scale: jax.Array, # [2*inner] f32 per-out-channel
    b1: jax.Array,
    w2q: jax.Array,      # [inner, dout] int8
    w2_scale: jax.Array, # [dout]
    b2: jax.Array,
    out_dtype=jnp.bfloat16,
    pre_quant: Optional[tuple[jax.Array, jax.Array]] = None,  # (xq, sx [R,1])
) -> jax.Array:
    from leftrefill_tpu.ops.quant import quantize_activation_rowwise

    r, din = x.shape
    inner, dout = w2q.shape
    plan = _plan(r, din, inner, dout, x_elt=1, w_elt=1)
    assert plan is not None, "caller must check geglu_fused_qualifies"
    blk_r, ci = plan
    nc = inner // ci

    xq, sx = pre_quant if pre_quant is not None else quantize_activation_rowwise(x)
    b1f = b1.astype(jnp.float32).reshape(1, 2 * inner)
    b2f = b2.astype(jnp.float32).reshape(1, dout)
    s1 = w1_scale.astype(jnp.float32).reshape(1, 2 * inner)
    s2 = w2_scale.astype(jnp.float32).reshape(1, dout)
    # "int8" (default): per-chunk requant + int8 second GEMM — fastest
    # (in-process A/B: UNet fwd 29.22 vs 29.46 ms; the kernel is MXU-bound,
    # so the requant VPU chain is cheaper than bf16 MXU rate on GEMM-2).
    # "bf16": bf16 second GEMM on raw int8 weight values — ~3% slower FF but
    # HALVES the kernel's quantization error (rel 0.016 vs 0.036 at ds1); a
    # quality knob for accuracy-sensitive serving.
    w2_bf16 = os.environ.get("LEFTREFILL_GEGLU_INT8_W2", "int8") == "bf16"

    o_spec = pl.BlockSpec((blk_r, dout), lambda i, c: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((blk_r, din), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((blk_r, 1), lambda i, c: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((din, ci), lambda i, c: (0, c), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ci), lambda i, c: (0, c), memory_space=pltpu.VMEM),
        pl.BlockSpec((din, ci), lambda i, c, nc=nc: (0, c + nc), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ci), lambda i, c, nc=nc: (0, c + nc), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ci), lambda i, c: (0, c), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ci), lambda i, c, nc=nc: (0, c + nc), memory_space=pltpu.VMEM),
        pl.BlockSpec((ci, dout), lambda i, c: (c, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dout), lambda i, c: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dout), lambda i, c: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [xq, sx, w1q, s1, w1q, s1, b1f, b1f, w2q, s2, b2f]
    return pl.pallas_call(
        functools.partial(_geglu_int8_kernel, w2_bf16=w2_bf16),
        out_shape=jax.ShapeDtypeStruct((r, dout), out_dtype),
        grid=(r // blk_r, nc),
        in_specs=in_specs,
        out_specs=o_spec,
        scratch_shapes=[pltpu.VMEM((blk_r, dout), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * r * din * 2 * inner + 2 * r * inner * dout,
            bytes_accessed=xq.size + w1q.size + w2q.size + r * dout * 2,
            transcendentals=r * inner,
        ),
    )(*operands)


def geglu_fused_qualifies(r: int, din: int, inner: int, dout: int, int8: bool) -> bool:
    from leftrefill_tpu.ops.conv import on_tpu

    elt = 1 if int8 else 2
    return (
        _GEGLU_FUSED
        and on_tpu()
        and r >= 128
        and din >= 64
        and dout >= 64
        and _plan(r, din, inner, dout, x_elt=elt, w_elt=elt) is not None
    )


def geglu_reference(x, w1, b1, w2, b2):
    """XLA oracle with identical semantics (value * exact erf-gelu(gate),
    then dot) — uses lax.erf, so it also checks the in-kernel erf approx."""
    xg = x.astype(jnp.float32) @ w1.astype(jnp.float32) + b1.astype(jnp.float32)
    val, gate = jnp.split(xg, 2, axis=-1)
    h = val * (0.5 * gate * (1.0 + jax.lax.erf(gate * (2.0 ** -0.5))))
    return h @ w2.astype(jnp.float32) + b2.astype(jnp.float32)
