"""SD2-inpainting UNet as Flax modules (NHWC, TPU-native).

Behavioural reference:
- UNetModel / ResBlock / Up/Downsample: /root/reference/ldm/modules/diffusionmodules/openaimodel.py:90-787
- SpatialTransformer / BasicTransformerBlock / CrossAttention / GEGLU:
  /root/reference/ldm/modules/attention.py:51-419

Design notes (TPU-first, not a translation):
- spatial tensors are NHWC; convs use explicit torch-compatible padding,
- params are stored fp32; compute dtype is a module field (bf16 on TPU),
- GroupNorm + attention softmax are fp32 islands (matching the reference's
  GroupNorm32 + ATTN_PRECISION=fp32 autocast islands),
- attention dispatches to a Pallas flash kernel on TPU (ops/attention.py),
- module/parameter naming mirrors the torch checkpoint key structure
  (``input_blocks.1.0.in_layers.2.weight`` -> params['input_blocks_1_0']
  ['in_layers_2']['kernel']) so the weight converter is a mechanical map,
- gradient checkpointing (reference CheckpointFunction) is `jax.checkpoint`
  via nn.remat, enabled by the ``remat`` field for the training path.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from leftrefill_tpu.ops.attention import multi_head_attention
from leftrefill_tpu.ops.layers import (
    GroupNorm32,
    avg_pool_2x,
    nearest_upsample_2x,
    timestep_embedding,
)

Dtype = Any
PAD1 = ((1, 1), (1, 1))


class Conv3x3(nn.Module):
    """3x3 stride-1 pad-1 conv with the same param layout as nn.Conv
    (kernel HWIO + bias), dispatched to the Pallas conv kernel on TPU
    (ops/conv.py) and the XLA conv elsewhere — numerically identical.

    ``quant=True`` declares an extra ``kernel_scale`` param and, when the
    apply-time kernel is int8 (see ops/quant.quantize_params_like), runs the
    W8A8 int8 conv kernel — falling back to a dequantized fp conv where the
    shape does not qualify (so an int8 tree is always numerically valid)."""

    features: int
    zero: bool = False
    dtype: Dtype = jnp.float32
    quant: bool = False
    strides: int = 1  # stride-2 (Downsample) supported on the quant path

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero else nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        scale = (
            self.param("kernel_scale", nn.initializers.ones, (self.features,), jnp.float32)
            if self.quant
            else None
        )
        return conv3x3_forward(
            x, kernel, bias, scale, self.dtype, self.quant, strides=self.strides
        )


def conv3x3_forward(x, kernel, bias, scale, dtype, quant, strides: int = 1) -> jax.Array:
    """Conv3x3's dispatch as a function (shared with the fused ResBlock)."""
    from leftrefill_tpu.ops.conv import conv3x3_apply

    ci = x.shape[-1]
    features = kernel.shape[-1]
    if quant and kernel.dtype == jnp.int8:
        from leftrefill_tpu.ops.quant import (
            conv3x3_int8,
            conv3x3_int8_qualifies,
            conv_int8_xla,
            int8_xla_conv_enabled,
        )

        b, h, w, _ = x.shape
        if strides == 1 and conv3x3_int8_qualifies(h, w, ci, features):
            return conv3x3_int8(
                x.astype(dtype), kernel, scale, bias.astype(dtype), out_dtype=dtype
            )
        if int8_xla_conv_enabled():
            return conv_int8_xla(
                x.astype(dtype), kernel, scale, bias,
                strides=(strides, strides), out_dtype=dtype,
            )
        # dequantize: exact inverse of the per-channel quantization
        kernel = kernel.astype(jnp.float32) * scale[None, None, None, :]
    x = x.astype(dtype)
    if strides != 1:
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(dtype), window_strides=(strides, strides),
            padding=PAD1, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(dtype)
    return conv3x3_apply(x, kernel.astype(dtype), bias.astype(dtype))


class QDense(nn.Module):
    """Dense with the nn.Dense param layout plus an optional int8 W8A8 path
    (kernel int8 + kernel_scale; dynamic per-tensor activation scale).  Used
    for the transformer projections/FF where the MXU int8 rate is ~2x bf16."""

    features: int
    use_bias: bool = True
    zero: bool = False
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        xq: Optional[jax.Array] = None,
        x_scale: Optional[jax.Array] = None,
    ) -> jax.Array:
        """xq/x_scale: optional pre-quantized input so callers applying
        several projections to the SAME activation (q/k/v) pay the dynamic
        quantization pass once (CrossAttention)."""
        din = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero else nn.initializers.lecun_normal(),
            (din, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        if self.quant:
            scale = self.param(
                "kernel_scale", nn.initializers.ones, (self.features,), jnp.float32
            )
            if kernel.dtype == jnp.int8:
                from leftrefill_tpu.ops.quant import dense_int8, quantize_activation_rowwise

                if xq is None:
                    xq, x_scale = quantize_activation_rowwise(x)
                return dense_int8(xq, x_scale, kernel, scale, bias, out_dtype=self.dtype)
        y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


def conv3x3(features: int, *, strides: int = 1, zero: bool = False, dtype: Dtype, name: str | None = None, quant: bool = False):
    if strides == 1 or quant:
        return Conv3x3(
            features=features, zero=zero, dtype=dtype, name=name, quant=quant,
            strides=strides,
        )
    return nn.Conv(
        features,
        kernel_size=(3, 3),
        strides=(strides, strides),
        padding=PAD1,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.zeros if zero else nn.initializers.lecun_normal(),
        bias_init=nn.initializers.zeros,
        name=name,
    )


class QConv1x1(nn.Module):
    """1x1 conv with nn.Conv's param layout (kernel [1,1,ci,co]) plus the W8A8
    int8 path — a 1x1 conv IS a dense over channels, so the int8 GEMM + per-row
    activation scales apply directly (reference sites: ResBlock.skip_connection,
    openaimodel.py:241-247)."""

    features: int
    zero: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ci = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero else nn.initializers.lecun_normal(),
            (1, 1, ci, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        scale = self.param("kernel_scale", nn.initializers.ones, (self.features,), jnp.float32)
        shp = x.shape
        k2d = kernel.reshape(ci, self.features)
        if kernel.dtype == jnp.int8:
            from leftrefill_tpu.ops.quant import dense_int8, quantize_activation_rowwise

            xq, xs = quantize_activation_rowwise(x.reshape(-1, ci))
            y = dense_int8(xq, xs, k2d, scale, bias, out_dtype=self.dtype)
            return y.reshape(*shp[:-1], self.features)
        y = x.astype(self.dtype).reshape(-1, ci) @ k2d.astype(self.dtype)
        y = y + bias.astype(self.dtype)
        return y.reshape(*shp[:-1], self.features)


def conv1x1(features: int, *, zero: bool = False, dtype: Dtype, name: str | None = None, quant: bool = False):
    if quant:
        return QConv1x1(features=features, zero=zero, dtype=dtype, name=name)
    return nn.Conv(
        features,
        kernel_size=(1, 1),
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.zeros if zero else nn.initializers.lecun_normal(),
        bias_init=nn.initializers.zeros,
        name=name,
    )


def dense(features: int, *, use_bias: bool = True, zero: bool = False, dtype: Dtype, name: str | None = None) -> nn.Dense:
    return nn.Dense(
        features,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.zeros if zero else nn.initializers.lecun_normal(),
        name=name,
    )


class LayerNormF32(nn.Module):
    """LayerNorm computed in fp32 (torch autocast behaviour), output cast back.

    Params are created directly as scale/bias so the tree path is
    ``<name>/{scale,bias}``, mirroring the torch key ``norm1.weight`` -> flax
    ``norm1/scale`` that the checkpoint converter emits (a nested nn.LayerNorm
    would land them at ``<name>/LayerNorm_0/*`` and silently never load)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, quant_rowwise: bool = False, norm_out: bool = True):
        """``quant_rowwise``: also return the per-row int8 quantization of the
        normalized output — (x_norm, xq, scales), fused into one Pallas pass
        on TPU (ops/quant.ln_quant_rowwise), (x_norm, None, None) when the
        fused kernel has no plan (caller computes its own quantization).
        ``norm_out=False``: the caller's consumers are all int8 — skip even
        the bf16 x_norm HBM write ((None, xq, scales))."""
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        if quant_rowwise:
            from leftrefill_tpu.ops.quant import ln_quant_qualifies, ln_quant_rowwise

            r = int(np.prod(x.shape[:-1]))
            if x.dtype == jnp.bfloat16 and ln_quant_qualifies(r, dim):
                return ln_quant_rowwise(x, scale, bias, eps=self.eps, norm_out=norm_out)
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        y = y.astype(x.dtype)
        return (y, None, None) if quant_rowwise else y


class Upsample(nn.Module):
    """Nearest x2 + optional 3x3 conv (openaimodel.py:90-118)."""

    channels: int
    use_conv: bool = True
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nearest_upsample_2x(x)
        if self.use_conv:
            x = conv3x3(self.channels, dtype=self.dtype, name="conv", quant=self.quant)(x)
        return x


class Downsample(nn.Module):
    """Stride-2 3x3 conv, torch padding=1 (openaimodel.py:133-159)."""

    channels: int
    use_conv: bool = True
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.use_conv:
            return conv3x3(
                self.channels, strides=2, dtype=self.dtype, name="op", quant=self.quant
            )(x)
        return avg_pool_2x(x)


class _GNParams(nn.Module):
    """GroupNorm32's param tree (scale/bias) without applying it — lets the
    ResBlock fuse norm+SiLU+quantize+conv into one Pallas chain."""

    @nn.compact
    def __call__(self, c: int):
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return scale, bias


class _Conv3x3Params(nn.Module):
    """Conv3x3's param tree (kernel/bias[/kernel_scale]) without applying."""

    features: int
    in_features: int
    zero: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero else nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        scale = (
            self.param("kernel_scale", nn.initializers.ones, (self.features,), jnp.float32)
            if self.quant
            else None
        )
        return kernel, bias, scale


class ResBlock(nn.Module):
    """Timestep-conditioned residual block (openaimodel.py:162-274).

    int8 path (quant + int8 kernels + plain stride): each GN+SiLU+conv stack
    runs as a fused prologue kernel + int8 conv (ops/quant.gn_silu_conv3x3_int8)
    — the emb-add / scale-shift fold into the GN affine algebraically, so XLA
    schedules only tiny reductions between Pallas calls (the r3 HLO inspection
    showed full-tensor layout copies around every XLA GN fusion otherwise)."""

    out_channels: int
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dtype: Dtype = jnp.float32
    quant: bool = False  # W8A8 int8 on the two 3x3 convs (ops/quant.py)

    @nn.compact
    def __call__(self, x, emb: jax.Array):
        from leftrefill_tpu.ops.layers import adjust_groups, group_norm32

        in_ch = x.shape[-1]
        g1s, g1b = _GNParams(name="in_layers_0")(in_ch)
        k1, c1b, s1 = _Conv3x3Params(
            features=self.out_channels, in_features=in_ch, quant=self.quant,
            name="in_layers_2",
        )()
        g2s, g2b = _GNParams(name="out_layers_0")(self.out_channels)
        k2, c2b, s2 = _Conv3x3Params(
            features=self.out_channels, in_features=self.out_channels,
            zero=True, quant=self.quant, name="out_layers_3",
        )()
        emb_out = dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            dtype=self.dtype,
            name="emb_layers_1",
        )(nn.silu(emb))

        fused = False
        if (
            os.environ.get("LEFTREFILL_FUSED_RES", "1") != "0"
            and self.quant
            and k1.dtype == jnp.int8
            and not self.up
            and not self.down
            and self.dtype == jnp.bfloat16
            and x.ndim == 4
        ):
            from leftrefill_tpu.ops.quant import (
                gn_silu_conv3x3_int8,
                gn_silu_conv3x3_int8_qualifies,
            )

            b, hh, ww, _ = x.shape
            g1 = adjust_groups(32, in_ch)
            g2 = adjust_groups(32, self.out_channels)
            if gn_silu_conv3x3_int8_qualifies(
                hh, ww, in_ch, self.out_channels, g1
            ) and gn_silu_conv3x3_int8_qualifies(
                hh, ww, self.out_channels, self.out_channels, g2
            ):
                fused = True
                h = gn_silu_conv3x3_int8(
                    x.astype(self.dtype), g1s, g1b, k1, s1, c1b,
                    num_groups=g1, out_dtype=self.dtype,
                )
                # the skip add stays a plain XLA add: the fused-residual
                # epilogue (LEFTREFILL_FUSED_RESADD) measured -1.3% e2e on
                # the r4 six-flag bisect and was removed in r5
                if self.use_scale_shift_norm:
                    scale, shift = jnp.split(emb_out, 2, axis=-1)
                    h = gn_silu_conv3x3_int8(
                        h, g2s, g2b, k2, s2, c2b, num_groups=g2,
                        scale_shift=(scale, shift), out_dtype=self.dtype,
                    )
                else:
                    h = gn_silu_conv3x3_int8(
                        h, g2s, g2b, k2, s2, c2b, num_groups=g2,
                        emb=emb_out, out_dtype=self.dtype,
                    )

        if not fused:
            h = group_norm32(x, g1s, g1b, num_groups=32, eps=1e-5)
            h = nn.silu(h)
            if self.up:
                h = nearest_upsample_2x(h)
                x = nearest_upsample_2x(x)
            elif self.down:
                h = avg_pool_2x(h)
                x = avg_pool_2x(x)
            h = conv3x3_forward(h, k1, c1b, s1, self.dtype, self.quant)
            eo = emb_out.astype(h.dtype)
            if self.use_scale_shift_norm:
                scale, shift = jnp.split(eo, 2, axis=-1)
                h = group_norm32(h, g2s, g2b, num_groups=32, eps=1e-5)
                h = h * (1 + scale[:, None, None, :]) + shift[:, None, None, :]
            else:
                h = h + eo[:, None, None, :]
                h = group_norm32(h, g2s, g2b, num_groups=32, eps=1e-5)
            h = nn.silu(h)
            h = conv3x3_forward(h, k2, c2b, s2, self.dtype, self.quant)

        if self.out_channels == in_ch:
            skip = x
        else:
            skip = conv1x1(
                self.out_channels, dtype=self.dtype, name="skip_connection",
                quant=self.quant,
            )(x)
        return skip.astype(h.dtype) + h


class _DenseParams(nn.Module):
    """Param holder with QDense's exact tree layout (kernel/bias
    [/kernel_scale]) so a parent can fuse several dense stages into one
    Pallas kernel without changing checkpoint key paths."""

    features: int
    in_features: int
    zero: bool = False
    quant: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero else nn.initializers.lecun_normal(),
            (self.in_features, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        scale = (
            self.param("kernel_scale", nn.initializers.ones, (self.features,), jnp.float32)
            if self.quant
            else None
        )
        return kernel, bias, scale


class GEGLUFeedForward(nn.Module):
    """GEGLU feed-forward (attention.py:51-78): Linear(dim, 2*inner) split into
    value*gelu(gate), then Linear(inner, dim).  Param names mirror torch
    ff.net.0.proj / ff.net.2.

    On TPU the whole FF runs as ONE fused Pallas kernel (ops/mlp.py) — the
    [B*N, 2*4*dim] GEGLU intermediates never touch HBM (~350 MB of traffic per
    ds1 FF on the XLA path, the measured second-biggest UNet time sink)."""

    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        res: Optional[jax.Array] = None,
        pre_quant: Optional[tuple[jax.Array, jax.Array]] = None,
    ) -> jax.Array:
        """``res``: residual tensor (the transformer block's ``+ x``), added
        after the kernel (a fused-residual epilogue measured -1.0% e2e on the
        r4 bisect and was removed in r5).
        ``pre_quant``: (xq, scales) of x from the fused LN+quant prenorm."""
        from leftrefill_tpu.ops.mlp import (
            geglu_fused,
            geglu_fused_int8,
            geglu_fused_qualifies,
        )

        inner = self.dim * self.mult
        din = x.shape[-1]
        k1, b1, s1 = _DenseParams(
            features=inner * 2, in_features=din, quant=self.quant, name="net_0_proj"
        )()
        k2, b2, s2 = _DenseParams(
            features=self.dim, in_features=inner, quant=self.quant, name="net_2"
        )()

        r = int(np.prod(x.shape[:-1]))
        x2 = x.reshape(r, din)
        int8 = self.quant and k1.dtype == jnp.int8
        # fused kernel computes in bf16; fp32 models (fidelity reference runs)
        # keep the XLA chain
        if self.dtype == jnp.bfloat16 and geglu_fused_qualifies(
            r, din, inner, self.dim, int8
        ):
            if int8:
                pq = None
                if pre_quant is not None and pre_quant[0] is not None:
                    pq = (
                        pre_quant[0].reshape(r, din),
                        pre_quant[1].reshape(r, 1),
                    )
                out = geglu_fused_int8(
                    x2.astype(self.dtype), k1, s1, b1, k2, s2, b2,
                    out_dtype=self.dtype,
                    pre_quant=pq,
                )
                out = out.reshape(*x.shape[:-1], self.dim)
                return out if res is None else out + res.astype(out.dtype)
            out = geglu_fused(x2.astype(self.dtype), k1, b1, k2, b2)
            out = out.reshape(*x.shape[:-1], self.dim)
            return out if res is None else out + res.astype(out.dtype)

        # fallback: QDense-equivalent math (CPU tests, odd shapes, dequant)
        def dense(h, k, b, s):
            if self.quant and k.dtype == jnp.int8:
                from leftrefill_tpu.ops.quant import dense_int8, quantize_activation_rowwise

                hq, hs = quantize_activation_rowwise(h)
                return dense_int8(hq, hs, k, s, b, out_dtype=self.dtype)
            y = h.astype(self.dtype) @ k.astype(self.dtype)
            return y + b.astype(self.dtype)

        xg = dense(x2, k1, b1, s1)
        val, gate = jnp.split(xg, 2, axis=-1)
        # torch F.gelu is the exact erf gelu
        h = val * nn.gelu(gate.astype(jnp.float32), approximate=False).astype(val.dtype)
        out = dense(h, k2, b2, s2).reshape(*x.shape[:-1], self.dim)
        return out if res is None else out + res.astype(out.dtype)


class CrossAttention(nn.Module):
    """Projection + multi-head attention (attention.py:147-250).  The actual
    attention math is in ops/attention.py (fp32 softmax; Pallas flash on TPU).

    ``attn_fn`` optionally replaces the attention math (same signature as
    ops.attention.multi_head_attention) — the multi-view block injects the
    context-parallel all-gather-KV attention here (parallel/context.py)."""

    heads: int
    dim_head: int
    query_dim: int
    context_dim: Optional[int] = None  # None => self-attention
    dtype: Dtype = jnp.float32
    attn_fn: Optional[Any] = None
    quant: bool = False

    def setup(self):
        inner = self.heads * self.dim_head
        self.to_q = QDense(inner, use_bias=False, dtype=self.dtype, quant=self.quant)
        self.to_k = QDense(inner, use_bias=False, dtype=self.dtype, quant=self.quant)
        self.to_v = QDense(inner, use_bias=False, dtype=self.dtype, quant=self.quant)
        self.to_out_0 = QDense(self.query_dim, dtype=self.dtype, quant=self.quant)

    def kv(self, context: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Precompute (k, v) for a fixed context — the conditioning KV cache.
        The sampling scan's cross-attention context (text conditioning) is
        step-invariant, but XLA does not hoist the projections out of the
        while loop (verified on the optimized HLO, scripts/tpu_r3_licm_check.py);
        computing them once per canvas and passing ``kv=`` removes 2 GEMMs +
        a quantization pass per cross-attn layer per step."""
        cq = cs = None
        if self.quant:
            from leftrefill_tpu.ops.quant import quantize_activation_rowwise

            cq, cs = quantize_activation_rowwise(context)
        return self.to_k(context, cq, cs), self.to_v(context, cq, cs)

    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        return_attn: bool = False,
        kv: Optional[tuple[jax.Array, jax.Array]] = None,
        pre_quant: Optional[tuple[jax.Array, jax.Array]] = None,
    ) -> jax.Array:
        """``pre_quant``: (xq, x_scale) of x, already quantized upstream (the
        fused LN+quant prenorm) — skips the quantization pass here."""
        ctx = x if context is None else context
        xq = sx = None
        if pre_quant is not None:
            xq, sx = pre_quant
        elif self.quant:
            # quantize each distinct activation once; q/k/v share it when
            # self-attending (3 projections, 1 quantization pass).  Per-row
            # scales: a hot token no longer collapses every row's resolution
            from leftrefill_tpu.ops.quant import quantize_activation_rowwise

            xq, sx = quantize_activation_rowwise(x)
        q = self.to_q(x, xq, sx)
        if kv is not None:
            k, v = kv
        else:
            if context is None:
                cq, cs = xq, sx
            elif self.quant:
                from leftrefill_tpu.ops.quant import quantize_activation_rowwise

                cq, cs = quantize_activation_rowwise(ctx)
            else:
                cq = cs = None
            k = self.to_k(ctx, cq, cs)
            v = self.to_v(ctx, cq, cs)
        if return_attn:
            # attention-visualization path (reference debug dumper,
            # multiview_attention.py:208-295): sow the head-mean probs so
            # apply(..., mutable=['intermediates']) collects them
            from leftrefill_tpu.ops.attention import attention_probs

            probs = attention_probs(q, k, self.heads)  # [B, Nq, Nk]
            self.sow("intermediates", "attn_score", probs)
        fn = self.attn_fn if self.attn_fn is not None else multi_head_attention
        out = fn(q, k, v, self.heads)
        return self.to_out_0(out)


class BasicTransformerBlock(nn.Module):
    """Self-attn -> cross-attn(context) -> GEGLU FF, prenorm+residual
    (attention.py:253-283).  ``self_attend`` is factored out so the multi-view
    block can override the token grouping of the self-attention."""

    dim: int
    n_heads: int
    d_head: int
    context_dim: int
    disable_self_attn: bool = False
    dtype: Dtype = jnp.float32
    quant: bool = False

    def _self_attn_fn(self):
        """Hook: override the self-attention math (the multi-view block
        returns the context-parallel attention when a view mesh is set)."""
        return None

    def setup(self):
        self.attn1 = CrossAttention(
            heads=self.n_heads,
            dim_head=self.d_head,
            query_dim=self.dim,
            context_dim=self.context_dim if self.disable_self_attn else None,
            dtype=self.dtype,
            attn_fn=self._self_attn_fn(),
            quant=self.quant,
            name="attn1",
        )
        self.attn2 = CrossAttention(
            heads=self.n_heads,
            dim_head=self.d_head,
            query_dim=self.dim,
            context_dim=self.context_dim,
            dtype=self.dtype,
            quant=self.quant,
            name="attn2",
        )
        self.ff = GEGLUFeedForward(self.dim, dtype=self.dtype, name="ff", quant=self.quant)
        self.norm1 = LayerNormF32(name="norm1")
        self.norm2 = LayerNormF32(name="norm2")
        self.norm3 = LayerNormF32(name="norm3")

    def self_attend(
        self,
        x_norm: jax.Array,
        context: Optional[jax.Array],
        pre_quant: Optional[tuple] = None,
    ) -> jax.Array:
        return self.attn1(
            x_norm, context if self.disable_self_attn else None, pre_quant=pre_quant
        )

    def _int8_active(self) -> bool:
        """True when the int8 param tree is loaded (inference after
        quantize_params_like) — the prenorm's bf16 output is then dead, so
        the fused LN+quant kernel skips even that HBM write.  False during
        init / fp runs (child params absent or fp32)."""
        try:
            k = self.attn1.to_q.get_variable("params", "kernel")
            return k is not None and k.dtype == jnp.int8
        except Exception:
            return False

    def cross_kv(self, context: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Precompute attn2's (k, v) for a fixed context (the conditioning KV
        cache; attn1 is self-attention in every shipped config and always
        recomputes its own projections)."""
        return self.attn2.kv(context)

    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        return_attn: bool = False,
        cross_kv: Optional[tuple[jax.Array, jax.Array]] = None,
        dup_to_context: bool = False,
    ) -> jax.Array:
        """``dup_to_context``: x carries HALF the context batch (the CFG
        shared-prefix path, UNetModel.cfg_dup) — everything before the first
        context consumer ran once; duplicate x right before it."""
        if dup_to_context and self.disable_self_attn:
            x = jnp.concatenate([x, x], axis=0)  # attn1 consumes context
            dup_to_context = False
        # fused LN+rowwise-quant prenorms (one Pallas pass feeds both the
        # attention projections and the FF kernel their int8 activations)
        lnq = self.quant and os.environ.get("LEFTREFILL_FUSED_LNQ", "1") != "0"
        # with the int8 tree loaded every prenorm consumer reads the int8
        # side, so the kernels skip the bf16 x_norm HBM write entirely (the
        # int8 xq stands in for shape-probing arguments)
        i8 = lnq and self._int8_active()
        if lnq:
            xn, xq, sx = self.norm1(x, quant_rowwise=True, norm_out=not i8)
            pq = (xq, sx) if xq is not None else None
            x = self.self_attend(xn if xn is not None else xq, context,
                                 pre_quant=pq) + x
        else:
            x = self.self_attend(self.norm1(x), context) + x
        if dup_to_context:
            x = jnp.concatenate([x, x], axis=0)
        if lnq:
            xn, xq, sx = self.norm2(x, quant_rowwise=True, norm_out=not i8)
            pq = (xq, sx) if xq is not None else None
            x = self.attn2(xn if xn is not None else xq, context,
                           return_attn=return_attn, kv=cross_kv,
                           pre_quant=pq) + x
            # ff falls back to x when its fused int8 kernel has no plan, so
            # only drop the norm output when that kernel will run
            from leftrefill_tpu.ops.mlp import geglu_fused_qualifies

            r = int(np.prod(x.shape[:-1]))
            ff_i8 = i8 and self.dtype == jnp.bfloat16 and geglu_fused_qualifies(
                r, self.dim, 4 * self.dim, self.dim, True
            )
            xn, xq, sx = self.norm3(x, quant_rowwise=True, norm_out=not ff_i8)
            pq = (xq, sx) if xq is not None else None
            x = self.ff(xn if xn is not None else xq, res=x, pre_quant=pq)
        else:
            x = self.attn2(self.norm2(x), context, return_attn=return_attn,
                           kv=cross_kv) + x
            x = self.ff(self.norm3(x), res=x)
        return x


class SpatialTransformer(nn.Module):
    """GroupNorm -> proj_in -> transformer blocks -> zero-init proj_out,
    residual (attention.py:331-419).  ``use_linear`` follows the SD2 configs
    (use_linear_in_transformer: True)."""

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: int = 1024
    use_linear: bool = True
    disable_self_attn: bool = False
    dtype: Dtype = jnp.float32
    quant: bool = False
    block_cls: type = BasicTransformerBlock
    block_kwargs: dict = None  # extra fields for block_cls (multi-view)
    ctx_slot: int = 0  # this ST's index in UNet traversal order (deep-prompt
    #                    per-layer context slice, Refill_modules.py:160-181)

    def setup(self):
        inner = self.n_heads * self.d_head
        # param holder (same scale/bias tree as GroupNorm32) so the quant
        # path can fuse GN + per-pixel int8 quantize feeding proj_in
        self.norm_params = _GNParams(name="norm")
        if self.use_linear:
            self.proj_in = QDense(inner, dtype=self.dtype, name="proj_in", quant=self.quant)
            # param holder (QDense's exact kernel/bias[/kernel_scale] tree):
            # the quant path fuses proj_out + the `x + x_in` residual + the
            # output channel-stats emission into one Pallas GEMM
            self.proj_out_params = _DenseParams(
                features=self.in_channels, in_features=inner, zero=True,
                quant=self.quant, name="proj_out",
            )
        else:
            self.proj_in = conv1x1(inner, dtype=self.dtype, name="proj_in")
            self.proj_out = conv1x1(self.in_channels, zero=True, dtype=self.dtype, name="proj_out")
        extra = dict(self.block_kwargs or {})
        self.blocks = [
            self.block_cls(
                dim=inner,
                n_heads=self.n_heads,
                d_head=self.d_head,
                context_dim=self.context_dim,
                disable_self_attn=self.disable_self_attn,
                dtype=self.dtype,
                quant=self.quant,
                name=f"transformer_blocks_{i}",
                **extra,
            )
            for i in range(self.depth)
        ]

    def _slice_context(self, context: Optional[jax.Array]) -> Optional[jax.Array]:
        """deep-prompt contexts are [B, n_layers, L, C] — one per cross-attn
        layer in traversal order; plain contexts [B, L, C] pass through."""
        if context is not None and context.ndim == 4:
            return context[:, self.ctx_slot]
        return context

    def cross_kv(self, context: jax.Array) -> list:
        """Per-depth precomputed attn2 (k, v) for a fixed context."""
        ctx = self._slice_context(context.astype(self.dtype))
        return [blk.cross_kv(ctx) for blk in self.blocks]

    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        cross_kv: Optional[list] = None,
        dup_to_context: bool = False,
        **kwargs,
    ):
        b, h, w, c = x.shape
        context = self._slice_context(context)
        x_in = x
        from leftrefill_tpu.ops.layers import group_norm32

        gs, gb = self.norm_params(c)
        fused_gnq = False
        if (
            self.quant
            and self.use_linear
            and x.dtype == jnp.bfloat16
            and os.environ.get("LEFTREFILL_FUSED_LNQ", "1") != "0"
        ):
            from leftrefill_tpu.ops.quant import gn_quant_qualifies, gn_quant_rowwise

            if gn_quant_qualifies(h, w, c):
                try:
                    k = self.proj_in.get_variable("params", "kernel")
                    i8 = k is not None and k.dtype == jnp.int8
                except Exception:
                    i8 = False
                xn, xq, sc = gn_quant_rowwise(
                    x, gs, gb, num_groups=32, eps=1e-6, norm_out=not i8
                )
                x = self.proj_in(
                    (xn if xn is not None else xq).reshape(b, h * w, c),
                    xq.reshape(b, h * w, c),
                    sc.reshape(b, h * w, 1),
                )
                fused_gnq = True
        if not fused_gnq:
            x = group_norm32(x, gs, gb, num_groups=32, eps=1e-6)
            if not self.use_linear:
                x = self.proj_in(x)
            x = x.reshape(b, h * w, x.shape[-1])
            if self.use_linear:
                x = self.proj_in(x)
        for i, blk in enumerate(self.blocks):
            extra = {"dup_to_context": True} if (dup_to_context and i == 0) else {}
            x = blk(
                x, context,
                cross_kv=cross_kv[i] if cross_kv is not None else None,
                **extra,
                **kwargs,
            )
        if not self.use_linear:
            x = x.reshape(x.shape[0], h, w, x.shape[-1])
            x = self.proj_out(x)
            if x.shape[0] != x_in.shape[0]:  # prefix ran at half batch (cfg_dup)
                x_in = jnp.concatenate([x_in, x_in], axis=0)
            return x + x_in

        # linear proj_out: kernel/bias from the param holder
        pk, pb, psc = self.proj_out_params()
        b2, hw, inner2 = x.shape
        if b2 != x_in.shape[0]:  # prefix ran at half batch (cfg_dup)
            x_in = jnp.concatenate([x_in, x_in], axis=0)
        res3 = x_in.reshape(b2, h * w, c)
        if self.quant and pk.dtype == jnp.int8:
            from leftrefill_tpu.ops.quant import (
                dense_int8,
                dense_int8_res_mom,
                dense_int8_res_mom_qualifies,
                quantize_activation_rowwise,
            )

            xq, sxr = quantize_activation_rowwise(x)
            if x.dtype == jnp.bfloat16 and dense_int8_res_mom_qualifies(
                b2, hw, inner2, c
            ):
                # fused GEMM + residual (the kernel also emits per-channel
                # output stats — retained as-is: it is the measured headline
                # kernel and the [B,4,C] stats output is free; the former
                # downstream stats CONSUMER chain, LEFTREFILL_CONV_MOMENTS,
                # measured -0.13% e2e and was removed in r5)
                out3, _mom = dense_int8_res_mom(xq, sxr, pk, psc, pb, res3)
                return out3.reshape(b2, h, w, c)
            x = dense_int8(xq, sxr, pk, psc, pb, out_dtype=self.dtype)
        else:
            x = x.astype(self.dtype) @ pk.astype(self.dtype) + pb.astype(self.dtype)
        return (x + res3.astype(x.dtype)).reshape(b2, h, w, c)


class UNetModel(nn.Module):
    """The SD2-inpainting UNet (openaimodel.py:412-787).

    Config for LeftRefill ref-inpainting (configs/ref_inpainting.yaml:20-36):
    in 9ch -> out 4ch, model_channels 320, ch_mult (1,2,4,4), 2 res blocks per
    level, spatial transformers at ds 1/2/4, depth 1, context 1024,
    head_dim 64, linear projections. 16 cross-attention layers total.

    __call__(x, timesteps, context) with x: [B, H, W, in_channels] NHWC.
    """

    in_channels: int = 9
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: Any = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    conv_resample: bool = True
    num_heads: int = -1
    num_head_channels: int = 64
    use_spatial_transformer: bool = True
    transformer_depth: int = 1
    context_dim: int = 1024
    use_linear_in_transformer: bool = True
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    dropout: float = 0.0  # 0 in every LeftRefill config; inference is deterministic
    dtype: Dtype = jnp.float32
    remat: bool = False  # jax.checkpoint on blocks (training path)
    quant: bool = False  # W8A8 int8 inference path (ops/quant.py, opt-in)
    block_cls: type = BasicTransformerBlock
    block_kwargs: dict = None

    def _num_res_blocks(self) -> list[int]:
        if isinstance(self.num_res_blocks, int):
            return [self.num_res_blocks] * len(self.channel_mult)
        return list(self.num_res_blocks)

    def _heads_dims(self, ch: int) -> tuple[int, int]:
        if self.num_head_channels == -1:
            return self.num_heads, ch // self.num_heads
        return ch // self.num_head_channels, self.num_head_channels

    def setup(self):
        time_embed_dim = self.model_channels * 4
        self.time_embed_0 = dense(time_embed_dim, dtype=self.dtype, name="time_embed_0")
        self.time_embed_2 = dense(time_embed_dim, dtype=self.dtype, name="time_embed_2")

        res_cls = nn.remat(ResBlock) if self.remat else ResBlock
        st_cls = nn.remat(SpatialTransformer, static_argnums=()) if self.remat else SpatialTransformer

        st_slots = iter(range(1000))  # traversal-order index (deep prompt)

        def make_st(ch: int, name: str) -> SpatialTransformer:
            heads, dim_head = self._heads_dims(ch)
            return st_cls(
                in_channels=ch,
                n_heads=heads,
                d_head=dim_head,
                depth=self.transformer_depth,
                context_dim=self.context_dim,
                use_linear=self.use_linear_in_transformer,
                dtype=self.dtype,
                quant=self.quant,
                block_cls=self.block_cls,
                block_kwargs=self.block_kwargs,
                ctx_slot=next(st_slots),
                name=name,
            )

        nrb = self._num_res_blocks()
        # Each block is a list of ("kind", module) pairs; the kind tag makes
        # _apply_seq dispatch explicit (remat wrappers hide the class, so
        # isinstance checks are unreliable).  Kinds: conv | res | st | resample.
        # --- input blocks ---------------------------------------------------
        input_blocks: list[list] = [
            [("conv", conv3x3(self.model_channels, dtype=self.dtype, name="input_blocks_0_0"))]
        ]
        input_block_chans = [self.model_channels]
        ch = self.model_channels
        ds = 1
        idx = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(nrb[level]):
                layers = [
                    (
                        "res",
                        res_cls(
                            out_channels=mult * self.model_channels,
                            use_scale_shift_norm=self.use_scale_shift_norm,
                            dtype=self.dtype,
                            quant=self.quant,
                            name=f"input_blocks_{idx}_0",
                        ),
                    )
                ]
                ch = mult * self.model_channels
                if ds in self.attention_resolutions:
                    layers.append(("st", make_st(ch, f"input_blocks_{idx}_1")))
                input_blocks.append(layers)
                input_block_chans.append(ch)
                idx += 1
            if level != len(self.channel_mult) - 1:
                input_blocks.append(
                    [
                        (
                            "resample",
                            Downsample(
                                ch,
                                use_conv=self.conv_resample,
                                dtype=self.dtype,
                                quant=self.quant,
                                name=f"input_blocks_{idx}_0",
                            ),
                        )
                    ]
                )
                input_block_chans.append(ch)
                ds *= 2
                idx += 1
        self.input_blocks = input_blocks
        self.input_block_chans = input_block_chans

        # --- middle ---------------------------------------------------------
        self.middle_block = [
            ("res", res_cls(out_channels=ch, use_scale_shift_norm=self.use_scale_shift_norm, dtype=self.dtype, quant=self.quant, name="middle_block_0")),
            ("st", make_st(ch, "middle_block_1")),
            ("res", res_cls(out_channels=ch, use_scale_shift_norm=self.use_scale_shift_norm, dtype=self.dtype, quant=self.quant, name="middle_block_2")),
        ]

        # --- output blocks --------------------------------------------------
        output_blocks: list[list] = []
        chans = list(self.input_block_chans)
        oidx = 0
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(nrb[level] + 1):
                chans.pop()
                layers = [
                    (
                        "res",
                        res_cls(
                            out_channels=self.model_channels * mult,
                            use_scale_shift_norm=self.use_scale_shift_norm,
                            dtype=self.dtype,
                            quant=self.quant,
                            name=f"output_blocks_{oidx}_0",
                        ),
                    )
                ]
                ch = self.model_channels * mult
                li = 1
                if ds in self.attention_resolutions:
                    layers.append(("st", make_st(ch, f"output_blocks_{oidx}_{li}")))
                    li += 1
                if level and i == nrb[level]:
                    layers.append(
                        (
                            "resample",
                            Upsample(
                                ch,
                                use_conv=self.conv_resample,
                                dtype=self.dtype,
                                quant=self.quant,
                                name=f"output_blocks_{oidx}_{li}",
                            ),
                        )
                    )
                    ds //= 2
                output_blocks.append(layers)
                oidx += 1
        self.output_blocks = output_blocks

        self.out_0 = GroupNorm32(32, eps=1e-5, name="out_0")
        self.out_2 = conv3x3(self.out_channels, zero=True, dtype=self.dtype, name="out_2")

    def _apply_seq(self, layers, h, emb, context, cross_kv=None, dup_state=None,
                   **kwargs):
        """TimestepEmbedSequential dispatch (openaimodel.py:73-87), made
        explicit with the kind tags attached in setup.

        ``dup_state`` ({"on": bool} or None): the CFG shared-prefix state —
        while on, h carries HALF the batch (the two CFG halves are identical
        until the first cross-attention consumes the context; see cfg_dup)."""
        dup_on = dup_state is not None and dup_state["on"]
        for kind, layer in layers:
            if kind == "res":
                e = emb[: h.shape[0]] if dup_on else emb
                h = layer(h, e)
            elif kind == "st":
                kv = cross_kv.get(layer.name) if cross_kv is not None else None
                extra = {"dup_to_context": True} if dup_on else {}
                h = layer(h, context, cross_kv=kv, **extra, **kwargs)
                if dup_on:
                    dup_state["on"] = dup_on = False
            elif kind in ("conv", "resample"):
                h = layer(h)
            else:
                raise ValueError(f"unknown layer kind {kind!r}")
        return h

    def _iter_sts(self):
        for layers in [*self.input_blocks, self.middle_block, *self.output_blocks]:
            for kind, layer in layers:
                if kind == "st":
                    yield layer

    def cross_kv(self, context: jax.Array) -> dict:
        """Precompute every cross-attention layer's (k, v) for a fixed
        context — the conditioning KV cache, keyed by ST module name.  Pass
        the result back as ``cross_kv=`` on __call__ (the sampling scan's
        text conditioning is step-invariant; XLA does not hoist the
        projections itself — scripts/tpu_r3_licm_check.py)."""
        context = context.astype(self.dtype)
        return {st.name: st.cross_kv(context) for st in self._iter_sts()}

    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        context: Optional[jax.Array] = None,
        cross_kv: Optional[dict] = None,
        cfg_dup: bool = False,
        **kwargs,
    ) -> jax.Array:
        """``cfg_dup``: the caller guarantees the two batch halves of x (and
        of timesteps) are IDENTICAL — the CFG doubling layout where cond and
        uncond share x_noisy and c_concat and differ only in the text context
        (serving protocol, ref_inpainting_gradio.py:105-121; the reference
        recomputes the shared prefix twice, ddim.py:317-343).  Everything up
        to the first cross-attention then runs ONCE at half batch and is
        duplicated at the first context consumer — bit-exact, saves the input
        conv + first ResBlock + first self-attention per step."""
        t_emb = timestep_embedding(timesteps, self.model_channels, dtype=self.dtype)
        emb = self.time_embed_2(nn.silu(self.time_embed_0(t_emb)))

        h = x.astype(self.dtype)
        if context is not None:
            context = context.astype(self.dtype)
        dup_state = None
        if cfg_dup and context is not None:
            assert h.shape[0] % 2 == 0, "cfg_dup needs the CFG-doubled batch"
            h = h[: h.shape[0] // 2]
            dup_state = {"on": True}
        hs = []
        for layers in self.input_blocks:
            h = self._apply_seq(
                layers, h, emb, context, cross_kv=cross_kv, dup_state=dup_state,
                **kwargs
            )
            hs.append(h)
        h = self._apply_seq(
            self.middle_block, h, emb, context, cross_kv=cross_kv,
            dup_state=dup_state, **kwargs
        )
        for layers in self.output_blocks:
            skip = hs.pop()
            if skip.shape[0] != h.shape[0]:  # skip stored before the dup point
                skip = jnp.concatenate([skip, skip], axis=0)
            h = jnp.concatenate([h, skip], axis=-1)
            h = self._apply_seq(
                layers, h, emb, context, cross_kv=cross_kv, dup_state=dup_state,
                **kwargs
            )
        if dup_state is not None and dup_state["on"]:  # no ST consumed it
            h = jnp.concatenate([h, h], axis=0)
        h = h.astype(x.dtype)
        h = nn.silu(self.out_0(h))
        return self.out_2(h).astype(x.dtype)
