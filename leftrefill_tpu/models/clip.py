"""OpenCLIP ViT-H text tower + prompt-token embedders, TPU-native.

Behavioural reference:
- PromptCLIPEmbedder: /root/reference/ldm/modules/encoders/Refill_modules.py:91-204
  (special-token blending, penultimate-layer output, repeat_N expansion,
  deep-prompt per-layer token sets, init from mean init-text embedding)
- the text tower itself is open_clip's 24-layer width-1024 causal transformer
  (arch "ViT-H-14", visual tower deleted, Refill_modules.py:106-107).

Key semantics replicated:
- token ids >= vocab_size (49408) select rows of a separate trainable
  ``special_embeddings`` table; all other weights are frozen
  (Refill_modules.py:171-178),
- "penultimate" output = run 23 of the 24 resblocks, then ln_final
  (layer_idx 1, Refill_modules.py:148-153, 193-201),
- deep_prompt mode returns [B, n_layers, L, C] — one context per
  cross-attention layer (Refill_modules.py:160-181).

Parameter names mirror the torch checkpoint keys
(``cond_stage_model.model.transformer.resblocks.N.*``) for the converter.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from leftrefill_tpu.models.tokenizer import (
    SimpleTokenizer,
    expand_special_tokens,
)
from leftrefill_tpu.ops.attention import causal_text_attention

Dtype = Any


class TextResBlock(nn.Module):
    """open_clip ResidualAttentionBlock: prenorm attn + prenorm MLP (gelu)."""

    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # attention with packed qkv projection (torch MultiheadAttention layout)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="ln_1")(x).astype(x.dtype)
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, param_dtype=jnp.float32, name="attn_in_proj")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = causal_text_attention(q, k, v, self.heads)
        attn = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32, name="attn_out_proj")(attn)
        x = x + attn

        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="ln_2")(x).astype(x.dtype)
        y = nn.Dense(4 * self.width, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_c_fc")(y)
        y = nn.gelu(y.astype(jnp.float32), approximate=False).astype(x.dtype)
        y = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_c_proj")(y)
        return x + y


class CLIPTextTransformer(nn.Module):
    """The frozen causal text transformer (embedding blending handled by the
    caller — input is already the blended token embedding [B, L, width])."""

    width: int = 1024
    heads: int = 16
    layers: int = 24
    context_length: int = 77
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, text_emb: jax.Array, skip_last: int = 0) -> jax.Array:
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
            jnp.float32,
        )
        x = text_emb + pos.astype(text_emb.dtype)
        n_apply = self.layers - skip_last
        for i in range(self.layers):
            blk = TextResBlock(self.width, self.heads, dtype=self.dtype, name=f"resblocks_{i}")
            if i < n_apply:
                x = blk(x)
            elif self.is_initializing():
                # materialize the skipped (penultimate-mode) block's params so
                # the tree matches the full open_clip checkpoint layout
                blk(x[:, :1])
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="ln_final")(x)
        return x


class PromptCLIPEmbedder(nn.Module):
    """Text conditioning with trainable prompt tokens (Refill_modules.py:91-204).

    ``__call__(tokens)`` takes pre-tokenized int32 ids:
      - plain: [B, L] -> [B, L, width]
      - deep_prompt: [B, n_layer, L] -> [B, n_layer, L, width]
    Host-side text -> ids goes through :meth:`tokenize` / the bound tokenizer.

    Only ``special_embeddings`` is trainable; everything else is frozen (the
    optimizer masks on this name, mirroring ref_inpainting_ldm.py:83-96).
    """

    vocab_size: int = 49408
    width: int = 1024
    heads: int = 16
    layers: int = 24
    context_length: int = 77
    layer: str = "penultimate"  # "last" | "penultimate"
    num_special_tokens: int = 50
    deep_prompt: bool = False
    cross_attn_layers: int = 16
    dtype: Dtype = jnp.float32

    def setup(self):
        assert self.layer in ("last", "penultimate")
        self.token_embedding = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (self.vocab_size, self.width),
            jnp.float32,
        )
        n_special = self.num_special_tokens * (
            self.cross_attn_layers if self.deep_prompt else 1
        )
        self.special_embeddings = self.param(
            "special_embeddings",
            nn.initializers.normal(0.01),
            (n_special, self.width),
            jnp.float32,
        )
        self.transformer = CLIPTextTransformer(
            width=self.width,
            heads=self.heads,
            layers=self.layers,
            context_length=self.context_length,
            dtype=self.dtype,
            name="model",
        )

    def blend_embeddings(self, tokens: jax.Array) -> jax.Array:
        """Regular/special embedding blend by id range (Refill_modules.py:173-178)."""
        mask = (tokens >= self.vocab_size).astype(jnp.float32)[..., None]
        regular_ids = jnp.clip(tokens, 0, self.vocab_size - 1)
        special_ids = jnp.maximum(tokens - self.vocab_size, 0)
        emb_regular = jnp.take(self.token_embedding, regular_ids, axis=0)
        emb_special = jnp.take(self.special_embeddings, special_ids, axis=0)
        out = emb_regular * (1 - mask) + emb_special * mask
        return out.astype(self.dtype)

    def __call__(self, tokens: jax.Array) -> jax.Array:
        skip_last = 1 if self.layer == "penultimate" else 0
        if self.deep_prompt:
            b, nlayer, length = tokens.shape
            flat = tokens.reshape(b * nlayer, length)
            z = self.transformer(self.blend_embeddings(flat), skip_last=skip_last)
            return z.reshape(b, nlayer, length, -1)
        return self.transformer(self.blend_embeddings(tokens), skip_last=skip_last)


def build_prompt_tokenizer(
    special_tokens: Sequence[str],
    init_text: Sequence[str] | None = None,
    deep_prompt: bool = False,
    cross_attn_layers: int = 16,
    bpe_path: str | None = None,
) -> tuple[SimpleTokenizer, list[str], list[str] | None]:
    """Expand ``repeat_N_*`` / deep-prompt token lists and build the extended
    tokenizer (Refill_modules.py:111-130)."""
    sp, init = expand_special_tokens(
        special_tokens, init_text, deep_prompt=deep_prompt, cross_attn_layers=cross_attn_layers
    )
    tok = SimpleTokenizer(bpe_path=bpe_path, special_tokens=sp)
    return tok, sp, init


def init_special_embeddings(
    tokenizer: SimpleTokenizer,
    special_tokens: Sequence[str],
    token_embedding: np.ndarray,
    init_text: Sequence[str] | None,
    tokenwise_init: bool = False,
) -> np.ndarray:
    """Initialize the trainable table from the frozen embedding
    (Refill_modules.py:29-56): mean embedding of the init sentence per token,
    or token-wise assignment of the sentence's first tokens."""
    width = token_embedding.shape[1]
    out = np.zeros((len(special_tokens), width), dtype=np.float32)
    if tokenwise_init:
        assert init_text is not None
        origin = tokenizer.encode(init_text[0])[: len(special_tokens)]
        for i, tok_idx in enumerate(origin):
            out[i] = token_embedding[tok_idx]
        for i in range(len(origin), len(special_tokens)):
            ids = tokenizer.encode(init_text[i])
            out[i] = token_embedding[np.asarray(ids)].mean(axis=0)
    else:
        for i, sp_token in enumerate(special_tokens):
            if init_text is None:
                ids = tokenizer.encode(sp_token.strip("<").strip(">").replace("-", " "))
            else:
                ids = tokenizer.encode(init_text[i])
            out[i] = token_embedding[np.asarray(ids)].mean(axis=0)
    return out
