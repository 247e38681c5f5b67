"""AutoencoderKL (the frozen SD2 VAE) as Flax modules, NHWC.

Behavioural reference:
- Encoder/Decoder/ResnetBlock/AttnBlock/Up/Downsample:
  /root/reference/ldm/modules/diffusionmodules/model.py:42-654
- AutoencoderKL encode/decode + quant convs:
  /root/reference/ldm/models/autoencoder.py:13-108
- DiagonalGaussianDistribution (fixed-seed deterministic sampling!):
  /root/reference/ldm/modules/distributions/distributions.py:24-62

LeftRefill config (configs/ref_inpainting.yaml:38-58): ch 128,
ch_mult (1,2,4,4), 2 res blocks, z=4 (double_z), attn only at the
bottleneck (attn_resolutions=[]), 8x total down/upsampling.

TPU notes: all convs torch-padding-compatible; GroupNorm eps 1e-6 fp32
islands; the bottleneck single-head attention runs through the shared
attention op (fp32 softmax).  The VAE is frozen in LeftRefill, so only the
forward path matters; params stored fp32, compute dtype configurable.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from leftrefill_tpu.ops.attention import multi_head_attention
from leftrefill_tpu.ops.layers import GroupNorm32, nearest_upsample_2x

Dtype = Any
PAD1 = ((1, 1), (1, 1))


# A gated Pallas route for the VAE's stride-1 3x3 convs (width-8 plans +
# h-slab decomposition, LEFTREFILL_VAE_PALLAS_CONV) was built in r5 and
# REMOVED: it won the isolated kernel probe at 4/6 decoder shapes but lost
# end-to-end clean (-6.8%, bench_logs_r5/bench_vaeconv_clean_r5b.log) —
# recorded negative in ops/conv.py; the VAE convs stay on nn.Conv/XLA.


def _conv(
    features: int, kernel: int = 3, strides: int = 1, padding=PAD1, *,
    dtype, name=None, quant: bool = False,
):
    if quant and strides == 1:
        # W8A8 variants with identical param layout (kernel HWIO + bias +
        # kernel_scale); dispatch falls back to an exact dequantized fp conv
        # wherever no int8 path qualifies, so the tree stays numerically valid.
        from leftrefill_tpu.models.unet import Conv3x3, QConv1x1

        if kernel == 3:
            return Conv3x3(features=features, dtype=dtype, name=name, quant=True)
        return QConv1x1(features=features, dtype=dtype, name=name)
    return nn.Conv(
        features,
        kernel_size=(kernel, kernel),
        strides=(strides, strides),
        padding=padding if kernel == 3 else ((0, 0), (0, 0)),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class VAEResnetBlock(nn.Module):
    """model.py:91-150 — GN(1e-6)+swish+conv ×2 with 1x1 nin_shortcut."""

    out_channels: int
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        h = GroupNorm32(32, eps=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = _conv(self.out_channels, dtype=self.dtype, name="conv1", quant=self.quant)(h)
        h = GroupNorm32(32, eps=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = _conv(self.out_channels, dtype=self.dtype, name="conv2", quant=self.quant)(h)
        if in_ch != self.out_channels:
            x = _conv(
                self.out_channels, kernel=1, dtype=self.dtype, name="nin_shortcut",
                quant=self.quant,
            )(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head bottleneck self-attention (model.py:153-204): 1x1-conv
    q/k/v/proj_out over flattened spatial tokens, residual."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        hn = GroupNorm32(32, eps=1e-6, name="norm")(x)
        q = _conv(c, kernel=1, dtype=self.dtype, name="q")(hn).reshape(b, h * w, c)
        k = _conv(c, kernel=1, dtype=self.dtype, name="k")(hn).reshape(b, h * w, c)
        v = _conv(c, kernel=1, dtype=self.dtype, name="v")(hn).reshape(b, h * w, c)
        out = multi_head_attention(q, k, v, num_heads=1, impl="xla")
        out = out.reshape(b, h, w, c)
        out = _conv(c, kernel=1, dtype=self.dtype, name="proj_out")(out)
        return x + out


class VAEDownsample(nn.Module):
    """Asymmetric (0,1) pad + stride-2 VALID conv (model.py:69-88)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.channels,
            kernel_size=(3, 3),
            strides=(2, 2),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


class VAEUpsample(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nearest_upsample_2x(x)
        return _conv(self.channels, dtype=self.dtype, name="conv", quant=self.quant)(x)


@dataclasses.dataclass(frozen=True)
class DDConfig:
    """The ddconfig dict of AutoencoderKL (configs/ref_inpainting.yaml:43-58)."""

    double_z: bool = True
    z_channels: int = 4
    resolution: int = 256
    in_channels: int = 3
    out_ch: int = 3
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0


class VAEEncoder(nn.Module):
    """model.py:453-544."""

    cfg: DDConfig = DDConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        h = _conv(cfg.ch, dtype=self.dtype, name="conv_in")(x.astype(self.dtype))
        curr_res = cfg.resolution
        num_res = len(cfg.ch_mult)
        for i_level in range(num_res):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                h = VAEResnetBlock(
                    block_out, dtype=self.dtype, name=f"down_{i_level}_block_{i_block}"
                )(h)
                if curr_res in cfg.attn_resolutions:
                    h = VAEAttnBlock(dtype=self.dtype, name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != num_res - 1:
                h = VAEDownsample(h.shape[-1], dtype=self.dtype, name=f"down_{i_level}_downsample")(h)
                curr_res //= 2
        h = VAEResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = VAEAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = GroupNorm32(32, eps=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return _conv(out_ch, dtype=self.dtype, name="conv_out")(h)


class VAEDecoder(nn.Module):
    """model.py:547-653.

    ``quant=True``: W8A8 int8 on the res-block convs (the decoder is ~70 ms of
    the 512x1024 canvas at ~25% MXU utilisation — conv-bound).  conv_in (4-ch
    input) and conv_out (the final RGB layer) stay fp: no speed win, highest
    quality sensitivity."""

    cfg: DDConfig = DDConfig()
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.cfg
        num_res = len(cfg.ch_mult)
        block_in = cfg.ch * cfg.ch_mult[num_res - 1]
        curr_res = cfg.resolution // 2 ** (num_res - 1)
        h = _conv(block_in, dtype=self.dtype, name="conv_in")(z.astype(self.dtype))
        h = VAEResnetBlock(block_in, dtype=self.dtype, quant=self.quant, name="mid_block_1")(h)
        h = VAEAttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = VAEResnetBlock(block_in, dtype=self.dtype, quant=self.quant, name="mid_block_2")(h)
        for i_level in reversed(range(num_res)):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = VAEResnetBlock(
                    block_out, dtype=self.dtype, quant=self.quant,
                    name=f"up_{i_level}_block_{i_block}",
                )(h)
                if curr_res in cfg.attn_resolutions:
                    h = VAEAttnBlock(dtype=self.dtype, name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = VAEUpsample(
                    h.shape[-1], dtype=self.dtype, quant=self.quant,
                    name=f"up_{i_level}_upsample",
                )(h)
                curr_res *= 2
        h = GroupNorm32(32, eps=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return _conv(cfg.out_ch, dtype=self.dtype, name="conv_out")(h)


class DiagonalGaussian:
    """distributions.py:24-62, NHWC (split along the last axis).

    The reference re-seeds torch's global RNG to 42 on *every* ``sample()``
    call (distributions.py:36-38), making VAE encoding deterministic = mean +
    a fixed noise draw.  We replicate that determinism with a fixed JAX key;
    pass an explicit key for honest sampling.
    """

    FIXED_SEED = 42

    def __init__(self, parameters: jax.Array, deterministic: bool = False):
        self.parameters = parameters
        mean, logvar = jnp.split(parameters, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)
        if deterministic:
            self.var = self.std = jnp.zeros_like(self.mean)

    def sample(self, key: Optional[jax.Array] = None) -> jax.Array:
        if key is None:
            key = jax.random.PRNGKey(self.FIXED_SEED)
        noise = jax.random.normal(key, self.mean.shape, dtype=self.mean.dtype)
        return self.mean + self.std * noise

    def kl(self, other: Optional["DiagonalGaussian"] = None) -> jax.Array:
        if self.deterministic:
            return jnp.array([0.0])
        axes = (1, 2, 3)
        if other is None:
            return 0.5 * jnp.sum(self.mean**2 + self.var - 1.0 - self.logvar, axis=axes)
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=axes,
        )

    def nll(self, sample: jax.Array, axes=(1, 2, 3)) -> jax.Array:
        if self.deterministic:
            return jnp.array([0.0])
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var, axis=axes
        )

    def mode(self) -> jax.Array:
        return self.mean


class AutoencoderKL(nn.Module):
    """autoencoder.py:13-108 — encoder + quant convs + decoder.

    ``__call__(x, mode)``: mode="encode" returns the moments [B,h,w,2*embed],
    mode="decode" decodes z [B,h,w,embed].  Helper wrappers below.
    """

    ddconfig: DDConfig = DDConfig()
    embed_dim: int = 4
    dtype: Dtype = jnp.float32
    quant_decoder: bool = False  # W8A8 decoder res-block convs (opt-in)

    def setup(self):
        self.encoder = VAEEncoder(self.ddconfig, dtype=self.dtype, name="encoder")
        self.decoder = VAEDecoder(
            self.ddconfig, dtype=self.dtype, quant=self.quant_decoder, name="decoder"
        )
        z = self.ddconfig.z_channels
        mult = 2 if self.ddconfig.double_z else 1
        self.quant_conv = nn.Conv(
            mult * self.embed_dim, kernel_size=(1, 1), dtype=self.dtype,
            param_dtype=jnp.float32, name="quant_conv",
        )
        self.post_quant_conv = nn.Conv(
            z, kernel_size=(1, 1), dtype=self.dtype,
            param_dtype=jnp.float32, name="post_quant_conv",
        )

    def encode_moments(self, x: jax.Array) -> jax.Array:
        return self.quant_conv(self.encoder(x))

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jax.Array) -> jax.Array:
        """Full autoencode (mode-sample) — used for init so both towers get
        parameters; inference uses apply(method=...) on encode/decode."""
        moments = self.encode_moments(x)
        mean, _ = jnp.split(moments, 2, axis=-1)
        return self.decode(mean)
