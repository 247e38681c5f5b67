"""PromptCLIPEmbedder tests (reference: Refill_modules.py:91-204)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leftrefill_tpu.models.clip import (
    PromptCLIPEmbedder,
    init_special_embeddings,
)
from leftrefill_tpu.models.tokenizer import SimpleTokenizer, expand_special_tokens

TINY = dict(vocab_size=49408, width=32, heads=4, layers=3, num_special_tokens=4)


@pytest.fixture(scope="module")
def embedder():
    model = PromptCLIPEmbedder(**TINY, layer="penultimate")
    tokens = jnp.zeros((2, 77), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens)
    return model, params


def test_output_shape(embedder):
    model, params = embedder
    tokens = jnp.full((2, 77), 49406, jnp.int32)
    z = jax.jit(model.apply)(params, tokens)
    assert z.shape == (2, 77, 32)
    assert jnp.isfinite(z).all()


def test_special_token_blend_gradient_only_touches_specials(embedder):
    """Gradients must flow only into special_embeddings rows selected by
    ids >= vocab_size (the trainable-prompt contract,
    ref_inpainting_ldm.py:83-96)."""
    model, params = embedder
    tokens = np.full((1, 77), 0, np.int32)
    tokens[0, 0] = 49406
    tokens[0, 1] = 49408 + 2  # special token #2
    tokens[0, 2] = 49407
    tokens = jnp.asarray(tokens)

    def loss(p):
        return jnp.sum(model.apply(p, tokens) ** 2)

    g = jax.jit(jax.grad(loss))(params)["params"]
    gs = np.asarray(g["special_embeddings"])
    assert np.abs(gs[2]).sum() > 0  # selected special row gets gradient
    assert np.abs(gs[[0, 1, 3]]).sum() == 0  # unselected rows don't


def test_penultimate_vs_last_differ():
    tokens = jnp.full((1, 77), 5, jnp.int32)
    m_last = PromptCLIPEmbedder(**TINY, layer="last")
    params = jax.jit(m_last.init)(jax.random.PRNGKey(0), tokens)
    m_pen = PromptCLIPEmbedder(**TINY, layer="penultimate")
    z_last = jax.jit(m_last.apply)(params, tokens)
    z_pen = jax.jit(m_pen.apply)(params, tokens)
    assert not np.allclose(np.asarray(z_last), np.asarray(z_pen))


def test_deep_prompt_output_rank():
    model = PromptCLIPEmbedder(**TINY, layer="penultimate", deep_prompt=True, cross_attn_layers=2)
    tokens = jnp.zeros((2, 2, 77), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), tokens)
    z = jax.jit(model.apply)(params, tokens)
    assert z.shape == (2, 2, 77, 32)
    # deep prompt table has num_special * layers rows
    assert params["params"]["special_embeddings"].shape == (8, 32)


def test_init_special_embeddings_mean():
    sp, init = expand_special_tokens(["repeat_3_<special-token>"], ["hello world"])
    tok = SimpleTokenizer(special_tokens=sp)
    table = np.random.RandomState(0).randn(49408, 8).astype(np.float32)
    w = init_special_embeddings(tok, sp, table, init)
    assert w.shape == (3, 8)
    ids = tok.encode("hello world")
    expected = table[np.asarray(ids)].mean(axis=0)
    for i in range(3):
        assert np.allclose(w[i], expected)


def test_text_block_parity_vs_torch_mha():
    """TextResBlock attention == torch MultiheadAttention with causal mask
    (the open_clip resblock oracle)."""
    import torch

    from leftrefill_tpu.models.clip import TextResBlock

    width, heads, n, b = 16, 2, 5, 2
    rng = np.random.RandomState(0)
    x = rng.randn(b, n, width).astype(np.float32)

    tmha = torch.nn.MultiheadAttention(width, heads, batch_first=False)
    ln1 = torch.nn.LayerNorm(width)
    fc = torch.nn.Linear(width, 4 * width)
    proj = torch.nn.Linear(4 * width, width)
    ln2 = torch.nn.LayerNorm(width)
    mask = torch.triu(torch.full((n, n), float("-inf")), diagonal=1)
    with torch.no_grad():
        xt = torch.from_numpy(x).permute(1, 0, 2)  # LND
        y = ln1(xt)
        attn_out, _ = tmha(y, y, y, attn_mask=mask, need_weights=False)
        xt = xt + attn_out
        y = ln2(xt)
        xt = xt + proj(torch.nn.functional.gelu(fc(y)))
        ref = xt.permute(1, 0, 2).numpy()

    m = TextResBlock(width=width, heads=heads)
    params = {
        "params": {
            "ln_1": {"scale": ln1.weight.detach().numpy(), "bias": ln1.bias.detach().numpy()},
            "attn_in_proj": {
                "kernel": tmha.in_proj_weight.detach().numpy().T,
                "bias": tmha.in_proj_bias.detach().numpy(),
            },
            "attn_out_proj": {
                "kernel": tmha.out_proj.weight.detach().numpy().T,
                "bias": tmha.out_proj.bias.detach().numpy(),
            },
            "ln_2": {"scale": ln2.weight.detach().numpy(), "bias": ln2.bias.detach().numpy()},
            "mlp_c_fc": {"kernel": fc.weight.detach().numpy().T, "bias": fc.bias.detach().numpy()},
            "mlp_c_proj": {"kernel": proj.weight.detach().numpy().T, "bias": proj.bias.detach().numpy()},
        }
    }
    out = np.asarray(jax.jit(m.apply)(params, jnp.asarray(x)))
    assert np.abs(out - ref).max() < 2e-5, np.abs(out - ref).max()
