"""Pallas TPU 3x3 convolution for the UNet/VAE conv stacks.

Why: XLA's conv lowering reaches only 81-86 of 230 TFLOP/s bf16 at the UNet's
NHWC shapes (measured on v5e, CLAUDE.md) — the single biggest end-to-end perf
lever left (reference conv stack: openaimodel.py:162-274).  This kernel
reformulates the stride-1 pad-1 3x3 conv as 9 accumulated MXU matmuls over
in-VMEM tiles:

    out[y, x, :] = sum_{dy,dx} in[y+dy-1, x+dx-1, :] @ W[dy, dx, :, :]

Layout strategy (what makes the taps free):
- The input is padded once in XLA and materialized as THREE column-shifted
  copies x0/x1/x2 = pad[:, :, dx:dx+W].  XLA fuses any elementwise prologue
  (GroupNorm affine, SiLU) into these copies, so they cost one extra HBM pass.
- Column blocking is then exact: block wj of the dx-shifted copy already
  contains the dx-window of that column block — no halo exchange.
- Row shifts dy slice the *untiled* leading spatial dim of the VMEM tile
  (free: lane/sublane layout is on the last two dims), and the
  [H, blk_w, Ci] -> [H*blk_w, Ci] reshape is layout-preserving because blk_w
  is a multiple of the sublane tile.
- Channel blocking accumulates over an fp32 VMEM scratch across the innermost
  grid dim; the output block is written once, on the last Ci step, with the
  bias folded in.

Backward: custom VJP through the XLA conv (training-path grads; the Pallas
kernel is the inference hot path, which runs 100x per sampled canvas).
"""

from __future__ import annotations

import functools
from typing import Literal, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

ConvImpl = Literal["auto", "xla", "pallas"]
# env overrides for A/B benchmarking without code changes
_DEFAULT_IMPL: ConvImpl = os.environ.get("LEFTREFILL_CONV_IMPL", "auto")  # type: ignore[assignment]

# conservative VMEM budget (bytes) for the _pick_blocks estimate.  Mosaic's
# true scoped-vmem allocation runs ~1.45x this estimate (measured: a config
# estimated at 11.3MB allocated 16.43MB and hit the 16MB scoped limit), so
# the budget is set to 10.5MB => ~15.2MB actual, under the limit.
_VMEM_BUDGET = int(10.5 * 1024 * 1024)
_SUBLANE = 16  # bf16 sublane tile; fp32 is 8, 16 is safe for both


def set_conv_impl(impl: ConvImpl) -> None:
    global _DEFAULT_IMPL
    _DEFAULT_IMPL = impl


def get_conv_impl() -> ConvImpl:
    return _DEFAULT_IMPL


def on_tpu() -> bool:
    """Shared platform probe for the kernel dispatchers."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _chan_blocks(total: int) -> list[int]:
    """Valid channel block sizes: Mosaic requires the minor block dim to be a
    multiple of 128 or the full array dim."""
    out = [total]
    for c in (1024, 896, 768, 640, 512, 384, 256, 128):
        if c < total and total % c == 0:
            out.append(c)
    return out


def pick_conv_blocks(
    h: int,
    w: int,
    ci: int,
    co: int,
    *,
    widths: tuple[int, ...],
    x_elt: int,
    w_elt: int,
    o_elt: int,
    budget: int,
    row_floor: int = 256,
) -> Optional[tuple[int, int, int]]:
    """Shared block planner for the bf16 and int8 conv kernels: (blk_w,
    blk_ci, blk_co) maximizing MXU tile quality under the VMEM budget, with
    the element sizes of x / weights / output parameterized (acc is always
    int32/fp32).  None if no aligned configuration fits."""
    widths = [bw for bw in widths if w % bw == 0 and bw <= w]
    cis = _chan_blocks(ci)
    cos = _chan_blocks(co)
    if not widths or ci < 64 or co < 64:
        return None

    def tile_eff(c: int) -> float:
        # fraction of the 128-wide MXU tile actually used in the K/N dims
        return c / (-(-c // 128) * 128)

    def search(min_rows: int):
        best, best_score = None, None
        for bw in widths:
            if h * bw < min_rows:  # too few matmul rows to stream the MXU
                continue
            for bci in cis:
                for bco in cos:
                    x_bytes = 3 * (h + 2) * bw * bci * x_elt * 2  # 3 copies, dbl-buffered
                    acc_bytes = h * bw * bco * 4
                    w_bytes = 9 * bci * bco * w_elt * 2
                    o_bytes = h * bw * bco * o_elt * 2
                    if x_bytes + acc_bytes + w_bytes + o_bytes > budget:
                        continue
                    # lexicographic: MXU tile efficiency in K and N, then
                    # larger blocks (fewer grid steps), then wider columns
                    score = (round(tile_eff(bci) * tile_eff(bco), 3), bci * bco, bw)
                    if best_score is None or score > best_score:
                        best, best_score = (bw, bci, bco), score
        return best

    best = search(row_floor)
    if best is None and row_floor:
        best = search(0)  # tiny spatial levels
    return best


def plan_conv_blocks(h, w, ci, co, **kw):
    """pick_conv_blocks with the zero-padded-Ci fallback: returns
    ((blk_w, blk_ci, blk_co), ci_effective) or None.  Non-128-aligned input
    channel counts (e.g. the 960-ch skip concats) pad to the next 128
    multiple; output channels are never padded."""
    blocks = pick_conv_blocks(h, w, ci, co, **kw)
    if blocks is not None:
        return blocks, ci
    ci_pad = -(-ci // 128) * 128
    if ci_pad != ci:
        blocks = pick_conv_blocks(h, w, ci_pad, co, **kw)
        if blocks is not None:
            return blocks, ci_pad
    return None


_BF16_PLAN_KW = dict(
    widths=(256, 128, 64, 32, 16), x_elt=2, w_elt=2, o_elt=2, budget=_VMEM_BUDGET
)


def _pick_blocks(h: int, w: int, ci: int, co: int) -> Optional[tuple[int, int, int]]:
    return pick_conv_blocks(h, w, ci, co, **_BF16_PLAN_KW)


# tap accumulation strategy: "sum9" = 9 separate MXU matmuls accumulated in
# fp32 scratch; "concat" = build the [rows, 9*blk_ci] im2col tile in VMEM and
# issue ONE matmul with K = 9*blk_ci (fewer MXU setups, one accumulate).
# "auto" picks concat for small spatial tiles (few matmul rows -> the deep-K
# single matmul keeps the MXU busy) and sum9 for large ones.
_TAP_MODE = os.environ.get("LEFTREFILL_CONV_TAPS", "auto")


def set_conv_tap_mode(mode: str) -> None:
    global _TAP_MODE
    assert mode in ("auto", "sum9", "concat")
    _TAP_MODE = mode


def _resolve_tap_mode(h: int, w: int) -> str:
    if _TAP_MODE != "auto":
        return _TAP_MODE
    # concat's im2col tile + reshaped weights add ~blk_rows*9*blk_ci*2 +
    # 9*blk_ci*blk_co*2 bytes of VMEM on top of the plan estimate — safe only
    # at the tiny-spatial levels (where it also helps most: few matmul rows)
    return "concat" if h * w <= 256 else "sum9"


def _conv_kernel(*refs, tap_mode):
    x0_ref, x1_ref, x2_ref, w_ref, b_ref, o_ref, acc_ref = refs
    ci = pl.program_id(3)

    @pl.when(ci == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    h = o_ref.shape[1]
    blk_w = o_ref.shape[2]
    blk_ci = x0_ref.shape[3]
    if tap_mode == "concat":
        # im2col in VMEM: taps ordered (dy, dx) to match w.reshape(9*ci, co)
        tiles = [
            xr[0, dy : dy + h].reshape(h * blk_w, blk_ci)
            for dy in range(3)
            for xr in (x0_ref, x1_ref, x2_ref)
        ]
        xs = jnp.concatenate(tiles, axis=1)  # [rows, 9*blk_ci]
        wf = w_ref[...].reshape(9 * blk_ci, w_ref.shape[3])
        acc_ref[...] += jax.lax.dot_general(
            xs,
            wf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        for dx, xr in enumerate((x0_ref, x1_ref, x2_ref)):
            for dy in range(3):
                xs = xr[0, dy : dy + h].reshape(h * blk_w, blk_ci)
                acc_ref[...] += jax.lax.dot_general(
                    xs,
                    w_ref[dy, dx],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

    @pl.when(ci == pl.num_programs(3) - 1)
    def _write():
        r = acc_ref[...] + b_ref[0].astype(jnp.float32)[None, :]
        r = r.reshape(h, blk_w, o_ref.shape[3])
        o_ref[0] = r.astype(o_ref.dtype)


def _plan(h: int, w: int, ci: int, co: int) -> Optional[tuple[tuple[int, int, int], int]]:
    return plan_conv_blocks(h, w, ci, co, **_BF16_PLAN_KW)


def _conv3x3_pallas(x: jax.Array, w: jax.Array, bias: jax.Array) -> jax.Array:
    b, h, wd, ci = x.shape
    co = w.shape[-1]
    plan = _plan(h, wd, ci, co)
    assert plan is not None, "caller must check conv3x3_qualifies"
    (blk_w, blk_ci, blk_co), ci_eff = plan

    cpad = ci_eff - ci
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, cpad)))
    if cpad:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cpad), (0, 0)))
    ci = ci_eff
    # three column-shifted copies: block wj of copy dx holds the dx-window
    x0 = xp[:, :, 0:wd]
    x1 = xp[:, :, 1 : wd + 1]
    x2 = xp[:, :, 2 : wd + 2]
    w = w.astype(x.dtype)
    # 2-D bias: 1-D f32 operands get an XLA layout (T(1024)) that Mosaic's
    # (blk,) block shape cannot match; (1, co) uses the standard 2-D tiling
    bias2 = bias.astype(jnp.float32).reshape(1, co)

    grid = (b, co // blk_co, wd // blk_w, ci // blk_ci)
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
    ]
    operands = [x0, x1, x2, w, bias2]
    out = pl.pallas_call(
        functools.partial(_conv_kernel, tap_mode=_resolve_tap_mode(h, wd)),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, co), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        scratch_shapes=[pltpu.VMEM((h * blk_w, blk_co), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * b * h * wd * ci * co,
            bytes_accessed=(3 * x.size + w.size + b * h * wd * co) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(*operands)
    return out


def _xla_conv(x: jax.Array, w: jax.Array, bias: jax.Array) -> jax.Array:
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias.astype(out.dtype)


@jax.custom_vjp
def conv3x3_op(x: jax.Array, w: jax.Array, bias: jax.Array) -> jax.Array:
    """3x3 stride-1 pad-1 conv, NHWC x HWIO.  Pallas forward; XLA-conv VJP."""
    return _conv3x3_pallas(x, w, bias)


def _fwd(x, w, bias):
    return _conv3x3_pallas(x, w, bias), (x, w, bias)


def _bwd(res, g):
    x, w, bias = res
    _, vjp = jax.vjp(_xla_conv, x, w, bias)
    return vjp(g)


conv3x3_op.defvjp(_fwd, _bwd)


# A fused-residual epilogue variant (conv3x3_res_op, LEFTREFILL_FUSED_RESADD)
# was built and measured end-to-end NEGATIVE (-1.3%) on the r4 six-flag
# bisect (bench_logs_r4) — removed in r5; ResBlock adds its skip in XLA.


def conv3x3_qualifies(h: int, w: int, ci: int, co: int) -> bool:
    return (
        on_tpu()
        and ci >= 64
        and co >= 64
        and h * w >= 256
        and _plan(h, w, ci, co) is not None
    )


def conv3x3_apply(
    x: jax.Array,
    w: jax.Array,
    bias: jax.Array,
    impl: ConvImpl | None = None,
) -> jax.Array:
    """Dispatcher: Pallas kernel on TPU when the shape qualifies, else the
    XLA conv (CPU tests, odd shapes, tiny channels)."""
    use = impl or _DEFAULT_IMPL
    b, h, wd, ci = x.shape
    co = w.shape[-1]
    # the kernel and its VMEM plan are bf16-sized; fp32 models (fidelity
    # reference runs) take the XLA conv — an f32 plan would blow scoped vmem
    if x.dtype != jnp.bfloat16:
        use = "xla"
    if use in ("auto", "pallas") and conv3x3_qualifies(h, wd, ci, co):
        # "pallas" also only *prefers* the kernel: shapes with no aligned
        # block plan (e.g. the 9-channel stem) always take the XLA conv
        return conv3x3_op(x, w, bias)
    return _xla_conv(x, w, bias)


# ---------------------------------------------------------------------------
# big-spatial (VAE) coverage: REMOVED (r5, measured negative).  Width-8 plans
# at 256x512 + overlapping h-slab decomposition at 512x1024 won the isolated
# kernel probe at 4/6 decoder shapes (up to 2.5x, vaeconv_probe_r5.log) but
# LOST end-to-end twice: -5.5% contended and -6.8% clean
# (bench_logs_r5/bench_vaeconv_clean_r5b.log: 1.9707 vs the 2.1134 epoch) —
# the same kernel-wins-eaten-by-lost-XLA-fusion pattern as the r4 fusion-gate
# bisect.  The VAE's stride-1 3x3 convs stay on nn.Conv/XLA.  The probe
# script (scripts/tpu_r5_vaeconv_probe.py) is stamped obsolete — it exits
# with a pointer here; restore the deleted dispatcher from git history to
# re-run the measurement.
