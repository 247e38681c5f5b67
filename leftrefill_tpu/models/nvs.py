"""Novel-view-synthesis models: sep-token UNet, pose-conditioned embedder,
refinement CNN.

Behavioural reference:
- NVSUnetModel (separator column + c_input residual):
  /root/reference/inpainting_ldm/NVS_ldm.py:22-104
- refinement CNN (strided conv stack 4 -> model_channels at 1/8 res) and
  refinement_alpha: NVS_ldm.py:124-148, get_input c_input: :170-193
- RelPosModel + NVSCLIPEmbedder (pose-token overwrite at slot
  len(special_tokens)+1, training-time CFG prompt dropout, pos_strengthen
  final-token overwrite): /root/reference/ldm/modules/encoders/NVS_modules.py:92-270
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from leftrefill_tpu.models.clip import PromptCLIPEmbedder
from leftrefill_tpu.models.unet import Downsample, UNetModel, Upsample
from leftrefill_tpu.ops.layers import GroupNorm32

Dtype = Any

# separator-token channel table for the SD2 config (NVS_ldm.py:27): input 9ch,
# the UNet level widths, and the skip-concat widths seen by output blocks.
# The general table is derived from the config in NVSUnetModel.setup.
SEP_CHANNELS = (9, 320, 640, 1280, 2560, 1920, 960)


class NVSUnetModel(UNetModel):
    """UNet with a learned per-channel separator column spliced between the
    left/right canvas halves around every non-resampling block, plus an
    additive ``c_input`` refinement residual after input block 0."""

    use_sep: bool = False

    def _sep_channel_set(self) -> list[int]:
        """Channel widths at which a separator column is spliced: the input
        channels of every non-resampling block (input/middle/output, where
        output blocks see skip-concatenated widths).  Yields
        (9,320,640,1280,2560,1920,960) for the SD2 config (NVS_ldm.py:27)."""
        nrb = self._num_res_blocks()
        chans: set[int] = {self.in_channels}  # the stem conv block
        # input walk: res block i's input = previous block's output width
        ch = self.model_channels
        skips = [self.model_channels]
        for level, mult in enumerate(self.channel_mult):
            for _ in range(nrb[level]):
                chans.add(skips[-1])
                ch = mult * self.model_channels
                skips.append(ch)
            if level != len(self.channel_mult) - 1:
                skips.append(ch)  # downsample block: no sep spliced
        # middle block input
        chans.add(ch)
        # output blocks: input = previous h width + popped skip width
        h_ch = ch
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for _ in range(nrb[level] + 1):
                chans.add(h_ch + skips.pop())
                h_ch = self.model_channels * mult
        return sorted(chans)

    def setup(self):
        super().setup()
        if self.use_sep:
            self.sep_tokens = {
                str(ch): self.param(
                    f"sep_token_{ch}", nn.initializers.normal(1.0), (ch,), jnp.float32
                )
                for ch in self._sep_channel_set()
            }

    def _splice_sep(self, h: jax.Array) -> jax.Array:
        b, hh, w, c = h.shape
        sep = self.sep_tokens[str(c)].astype(h.dtype)
        col = jnp.broadcast_to(sep[None, None, None, :], (b, hh, 1, c))
        return jnp.concatenate([h[:, :, : w // 2], col, h[:, :, w // 2 :]], axis=2)

    def _strip_sep(self, h: jax.Array, w: int) -> jax.Array:
        return jnp.concatenate([h[:, :, : w // 2], h[:, :, -(w // 2) :]], axis=2)

    def _is_resample(self, layers) -> bool:
        kind, _ = layers[-1]
        return kind == "resample"

    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        context: Optional[jax.Array] = None,
        c_input: Optional[jax.Array] = None,
        **kwargs,
    ) -> jax.Array:
        from leftrefill_tpu.ops.layers import timestep_embedding

        t_emb = timestep_embedding(timesteps, self.model_channels, dtype=self.dtype)
        emb = self.time_embed_2(nn.silu(self.time_embed_0(t_emb)))
        h = x.astype(self.dtype)
        if context is not None:
            context = context.astype(self.dtype)

        hs = []
        for i, layers in enumerate(self.input_blocks):
            use_sep_here = self.use_sep and not self._is_resample(layers)
            w = h.shape[2]
            if use_sep_here:
                h = self._splice_sep(h)
            h = self._apply_seq(layers, h, emb, context, **kwargs)
            if use_sep_here:
                h = self._strip_sep(h, w)
            if i == 0 and c_input is not None:
                # NVS_ldm.py:64-68.  Applied after the sep strip: the
                # reference adds before stripping, but its sep+refine combo
                # is shape-inconsistent and never enabled together in any
                # shipped config.
                ci = c_input.astype(h.dtype)
                if ci.shape == h.shape:
                    h = h + ci
                else:  # refine only the (right) target half
                    half = h.shape[2] // 2
                    h = h.at[:, :, half:, :].add(ci)
            hs.append(h)

        if self.use_sep:
            w = h.shape[2]
            h = self._splice_sep(h)
        h = self._apply_seq(self.middle_block, h, emb, context, **kwargs)
        if self.use_sep:
            h = self._strip_sep(h, w)

        for layers in self.output_blocks:
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            use_sep_here = self.use_sep and not self._is_resample(layers)
            w = h.shape[2]
            if use_sep_here:
                h = self._splice_sep(h)
            h = self._apply_seq(layers, h, emb, context, **kwargs)
            if use_sep_here:
                h = self._strip_sep(h, w)

        h = h.astype(x.dtype)
        h = nn.silu(self.out_0(h))
        return self.out_2(h).astype(x.dtype)


class RefinementCNN(nn.Module):
    """Sub-pixel refinement branch (NVS_ldm.py:124-146): 4ch (masked image ⊕
    mask) -> model_channels at 1/8 resolution, scaled by the learned scalar
    ``refinement_alpha`` (init 0 => no-op at start of training)."""

    model_channels: int = 320
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, masked_image: jax.Array, mask: jax.Array) -> jax.Array:
        x = jnp.concatenate([masked_image, mask], axis=-1).astype(self.dtype)

        def conv(ch, stride, name):
            return nn.Conv(
                ch, kernel_size=(3, 3), strides=(stride, stride),
                padding=((1, 1), (1, 1)), dtype=self.dtype,
                param_dtype=jnp.float32, name=name,
            )

        x = nn.silu(conv(32, 1, "conv_0")(x))
        x = conv(64, 2, "conv_2")(x)
        x = nn.silu(GroupNorm32(16, name="norm_3")(x))
        x = conv(64, 1, "conv_5")(x)
        x = nn.silu(GroupNorm32(16, name="norm_6")(x))
        x = conv(128, 2, "conv_8")(x)
        x = nn.silu(GroupNorm32(32, name="norm_9")(x))
        x = conv(128, 1, "conv_11")(x)
        x = nn.silu(GroupNorm32(32, name="norm_12")(x))
        x = conv(256, 2, "conv_14")(x)
        x = nn.silu(GroupNorm32(32, name="norm_15")(x))
        x = conv(self.model_channels, 1, "conv_17")(x)
        x = nn.silu(GroupNorm32(32, name="norm_18")(x))
        alpha = self.param("refinement_alpha", nn.initializers.zeros, (), jnp.float32)
        return x * alpha.astype(x.dtype)


class RelPosModel(nn.Module):
    """4-D relative pose (dθ, sin dφ, cos dφ, dz) -> prompt embedding
    (NVS_modules.py:92-106)."""

    input_ch: int = 4
    out_ch: int = 1024
    pos_strengthen: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        d = lambda ch, name: nn.Dense(ch, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        x1 = d(self.out_ch // 2, "mlp1_0")(x.astype(self.dtype))
        x1 = d(self.out_ch, "mlp1_2")(nn.silu(x1))
        if self.pos_strengthen:
            x2 = d(self.out_ch, "mlp2_1")(nn.silu(x1))
            return x1, x2
        return x1, None


class NVSCLIPEmbedder(PromptCLIPEmbedder):
    """PromptCLIPEmbedder + relative-pose token + training CFG dropout
    (NVS_modules.py:193-248).

    __call__(tokens, rel_pose=None, null_tokens=None, cfg_key=None):
    - rel_pose [B,4]: its MLP embedding overwrites token slot
      num_special_tokens+1 before the transformer;
    - cfg_key given (training): with prob cfg_rate the whole prompt embedding
      is replaced by the null-prompt token embedding (null_tokens [1,L]);
    - pos_strengthen: second MLP output overwrites the final context token
      after the transformer (respecting the CFG mask).
    """

    pos_strengthen: bool = False
    cfg_rate: float = 0.0

    def setup(self):
        super().setup()
        self.rel_pos_model = RelPosModel(
            input_ch=4,
            out_ch=self.width,
            pos_strengthen=self.pos_strengthen,
            dtype=self.dtype,
            name="rel_pos_model",
        )

    def __call__(
        self,
        tokens: jax.Array,
        rel_pose: Optional[jax.Array] = None,
        null_tokens: Optional[jax.Array] = None,
        cfg_key: Optional[jax.Array] = None,
    ) -> jax.Array:
        skip_last = 1 if self.layer == "penultimate" else 0
        text_emb = self.blend_embeddings(tokens)

        emb2 = None
        if rel_pose is not None:
            emb1, emb2 = self.rel_pos_model(rel_pose)
            slot = self.num_special_tokens + 1
            text_emb = text_emb.at[:, slot, :].set(emb1.astype(text_emb.dtype))

        cfg_mask = None
        if self.cfg_rate > 0.0 and cfg_key is not None:
            assert null_tokens is not None
            null_emb = jnp.take(self.token_embedding, null_tokens[0], axis=0).astype(
                text_emb.dtype
            )
            rdv = jax.random.uniform(cfg_key, (text_emb.shape[0],))
            cfg_mask = (rdv < self.cfg_rate).astype(text_emb.dtype)[:, None, None]
            text_emb = (1 - cfg_mask) * text_emb + cfg_mask * null_emb[None]

        z = self.transformer(text_emb, skip_last=skip_last)

        if rel_pose is not None and emb2 is not None:
            pose_z = emb2.astype(z.dtype)
            if cfg_mask is not None:
                m = cfg_mask[:, 0]
                pose_z = pose_z * (1 - m) + z[:, -1, :] * m
            z = z.at[:, -1, :].set(pose_z)
        return z
