"""Torch oracle modules for golden-activation checks against real weights.

The SD2 checkpoint's text tower (cond_stage_model.model.*) is open_clip's
ViT-H text transformer; open_clip itself is not installed in the build env
(it downloads weights at import), so this assembles a torch module with the
EXACT open_clip parameter layout and state_dict keys (token_embedding,
positional_embedding, transformer.resblocks.N.{ln_1,attn,ln_2,mlp}, ln_final
— Refill_modules.py:91-204 reads it through these names).  Loading the real
checkpoint into it and comparing against our PromptCLIPEmbedder is then a
true golden-activation check.

Used by scripts/real_weights_runbook.py (stage 3) and mirrors the tiny
oracle in tests/test_golden_parity.py:test_full_text_tower_parity.
"""

from __future__ import annotations


def build_text_tower_oracle(
    vocab: int = 49408,
    width: int = 1024,
    heads: int = 16,
    layers: int = 24,
    n_special: int = 50,
    ctx_len: int = 77,
):
    """Returns a torch.nn.Module whose state_dict keys match
    cond_stage_model.* of the SD2 checkpoint (model.token_embedding.weight,
    model.transformer.resblocks.N.attn.in_proj_weight, ...) plus our
    special_embeddings table, and whose forward computes the penultimate-layer
    text features (Refill_modules.py:184-201: blend -> +pos -> causal
    transformer minus last block -> ln_final)."""
    import torch

    class _Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = torch.nn.LayerNorm(width)
            self.attn = torch.nn.MultiheadAttention(width, heads, batch_first=False)
            self.ln_2 = torch.nn.LayerNorm(width)
            self.mlp = torch.nn.Module()
            self.mlp.c_fc = torch.nn.Linear(width, 4 * width)
            self.mlp.c_proj = torch.nn.Linear(4 * width, width)

        def forward(self, x, attn_mask):
            y = self.ln_1(x)
            a, _ = self.attn(y, y, y, attn_mask=attn_mask, need_weights=False)
            x = x + a
            x = x + self.mlp.c_proj(torch.nn.functional.gelu(self.mlp.c_fc(self.ln_2(x))))
            return x

    class _Tower(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.model = torch.nn.Module()
            self.model.token_embedding = torch.nn.Embedding(vocab, width)
            self.model.positional_embedding = torch.nn.Parameter(torch.zeros(ctx_len, width))
            self.model.transformer = torch.nn.Module()
            self.model.transformer.resblocks = torch.nn.ModuleList(
                [_Block() for _ in range(layers)]
            )
            self.model.ln_final = torch.nn.LayerNorm(width)
            self.special_embeddings = torch.nn.Embedding(n_special, width)

        def forward(self, tokens):  # penultimate layer output
            is_special = tokens >= vocab
            reg = self.model.token_embedding(tokens.clamp(0, vocab - 1))
            spec = self.special_embeddings((tokens - vocab).clamp(min=0))
            x = torch.where(is_special[..., None], spec, reg)
            x = x + self.model.positional_embedding
            x = x.permute(1, 0, 2)  # LND
            mask = torch.triu(torch.full((ctx_len, ctx_len), float("-inf")), diagonal=1)
            for blk in self.model.transformer.resblocks[:-1]:  # penultimate
                x = blk(x, mask)
            x = x.permute(1, 0, 2)
            return self.model.ln_final(x)

    return _Tower()
