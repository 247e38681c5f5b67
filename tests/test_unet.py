"""Shape/structure tests for the UNet (reference: openaimodel.py:412-787)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leftrefill_tpu.models.unet import UNetModel

TINY = dict(
    in_channels=9,
    model_channels=32,
    out_channels=4,
    num_res_blocks=1,
    attention_resolutions=(1, 2),
    channel_mult=(1, 2),
    num_head_channels=8,
    context_dim=16,
)


@pytest.fixture(scope="module")
def tiny_unet():
    model = UNetModel(**TINY)
    x = jnp.zeros((2, 16, 32, 9))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 7, 16))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, ctx)
    return model, params


@pytest.mark.slow
def test_unet_output_shape(tiny_unet):
    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32, 9))
    t = jnp.array([10, 500])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 16))
    out = model.apply(params, x, t, ctx)
    assert out.shape == (2, 16, 32, 4)
    assert jnp.isfinite(out).all()


def test_unet_param_structure(tiny_unet):
    _, params = tiny_unet
    p = params["params"]
    # torch-key-mirroring names
    assert "input_blocks_0_0" in p  # stem conv
    assert "time_embed_0" in p and "time_embed_2" in p
    assert "middle_block_0" in p and "middle_block_1" in p and "middle_block_2" in p
    assert "out_0" in p and "out_2" in p
    # ResBlock internals
    rb = p["input_blocks_1_0"]
    for k in ("in_layers_0", "in_layers_2", "emb_layers_1", "out_layers_0", "out_layers_3"):
        assert k in rb, rb.keys()
    # SpatialTransformer internals
    st = p["input_blocks_1_1"]
    for k in ("norm", "proj_in", "proj_out", "transformer_blocks_0"):
        assert k in st, st.keys()
    tb = st["transformer_blocks_0"]
    for k in ("attn1", "attn2", "ff", "norm1", "norm2", "norm3"):
        assert k in tb
    assert "to_q" in tb["attn1"] and "to_out_0" in tb["attn2"]
    # zero-init modules produce zero output paths at init
    assert np.all(np.asarray(p["out_2"]["kernel"]) == 0)
    assert np.all(np.asarray(st["proj_out"]["kernel"]) == 0)


def test_unet_zero_init_output_is_zero(tiny_unet):
    """At init, the final conv is zero-init => output must be exactly 0
    (zero_module semantics, diffusionmodules/util.py:177-183)."""
    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 32, 9))
    out = model.apply(params, x, jnp.array([3]), jnp.zeros((1, 7, 16)))
    assert np.allclose(np.asarray(out), 0)


def test_unet_sd2_structure_block_count():
    """Full SD2 config: 16 cross-attn layers (configs/ref_inpainting.yaml:69),
    checked by counting SpatialTransformer param groups, without init of 865M
    params (structure only via eval_shape)."""
    model = UNetModel()  # defaults = SD2-inpainting config
    x = jnp.zeros((1, 64, 128, 9))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, 1024))
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x, t, ctx))
    p = shapes["params"]
    st_blocks = [k for k, v in p.items() if isinstance(v, dict) and "transformer_blocks_0" in v]
    assert len(st_blocks) == 16

    # 9-channel input stem
    assert p["input_blocks_0_0"]["kernel"].shape == (3, 3, 9, 320)
    assert p["out_2"]["kernel"].shape == (3, 3, 320, 4)


def test_return_attn_sows_cross_attention(tiny_unet):
    """return_attn collects per-layer cross-attn maps via flax intermediates
    (the reference's return_attn debug plumbing, ddim.py:282-300)."""
    from leftrefill_tpu.eval.attn_vis import collect_attention_maps

    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 32, 9))
    maps = collect_attention_maps(
        model, params["params"], x, jnp.array([7]), jnp.ones((1, 7, 16))
    )
    assert len(maps) >= 4  # one per SpatialTransformer
    for k, v in maps.items():
        assert k.endswith("attn_score")
        assert v.shape[-1] == 7  # context length
        assert np.allclose(v.sum(-1), 1.0, atol=1e-4)


def test_cross_kv_cache_bitexact(tiny_unet):
    """The conditioning KV cache (UNetModel.cross_kv -> cross_kv=) computes
    the same projections once: forward output is bit-identical to the
    per-call path (same math, different schedule)."""
    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 32, 9))
    t = jnp.array([10, 500])
    ctx = jax.random.normal(jax.random.PRNGKey(4), (2, 7, 16))
    ref = model.apply(params, x, t, ctx)
    kv = model.apply(params, ctx, method="cross_kv")
    assert set(kv) == {st.name for st in model.bind(params)._iter_sts()}
    out = model.apply(params, x, t, ctx, cross_kv=kv)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_deep_prompt_context_slices_per_layer(tiny_unet):
    """deep-prompt contexts [B, n_layers, L, C] feed one slice per
    cross-attention layer in traversal order (Refill_modules.py:160-181):
    all-equal slices reproduce the 3-D result; perturbing one slot changes
    the output."""
    from tests.test_tasks import unzero_kernels

    model, params = tiny_unet
    params = unzero_kernels(params)  # zero-init proj_out/out_2 block all ctx flow
    n_st = len(list(model.bind(params)._iter_sts()))
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 32, 9))
    t = jnp.array([10, 500])
    ctx = jax.random.normal(jax.random.PRNGKey(6), (2, 7, 16))
    deep = jnp.broadcast_to(ctx[:, None], (2, n_st, 7, 16))
    ref = model.apply(params, x, t, ctx)
    out = model.apply(params, x, t, deep)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    perturbed = deep.at[:, 1].add(1.0)
    out2 = model.apply(params, x, t, perturbed)
    assert not np.allclose(np.asarray(ref), np.asarray(out2))
    # the KV cache honors the per-slot slicing too
    kv = model.apply(params, perturbed, method="cross_kv")
    out3 = model.apply(params, x, t, perturbed, cross_kv=kv)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(out3))


@pytest.mark.slow
def test_cfg_dup_bitexact(tiny_unet):
    """cfg_dup (CFG shared-prefix): with identical batch halves of x/t and
    differing context halves, the half-batch prefix + duplicate-at-first-
    cross-attn path must equal the stock full-batch forward."""
    model, params = tiny_unet
    from tests.test_tasks import unzero_kernels

    p = {"params": unzero_kernels(params["params"])}
    k = jax.random.PRNGKey(3)
    x1 = jax.random.normal(k, (2, 16, 32, 9))
    x2 = jnp.concatenate([x1, x1], axis=0)
    t2 = jnp.full((4,), 321, jnp.int32)
    ctx2 = jax.random.normal(jax.random.fold_in(k, 1), (4, 7, 16))  # halves differ

    stock = model.apply(p, x2, t2, ctx2)
    dup = model.apply(p, x2, t2, ctx2, cfg_dup=True)
    np.testing.assert_allclose(np.asarray(dup), np.asarray(stock), atol=1e-6, rtol=1e-6)
    # and the halves really see different contexts (non-trivial check)
    assert not np.allclose(np.asarray(stock[:2]), np.asarray(stock[2:]))


def test_cfg_dup_with_kv_cache_and_deep_prompt(tiny_unet):
    """cfg_dup composes with the conditioning KV cache and 4-D deep-prompt
    contexts (one slice per cross-attn layer)."""
    model, params = tiny_unet
    from tests.test_tasks import unzero_kernels

    p = {"params": unzero_kernels(params["params"])}
    k = jax.random.PRNGKey(5)
    x1 = jax.random.normal(k, (1, 16, 32, 9))
    x2 = jnp.concatenate([x1, x1], axis=0)
    t2 = jnp.full((2,), 7, jnp.int32)
    # count cross-attn STs by probing cross_kv on a 3-D context
    ctx3 = jax.random.normal(jax.random.fold_in(k, 2), (2, 7, 16))
    kv = model.apply(p, ctx3, method="cross_kv")
    n_sts = len(kv)
    ctx4 = jax.random.normal(jax.random.fold_in(k, 3), (2, n_sts, 7, 16))

    stock = model.apply(p, x2, t2, ctx4)
    dup = model.apply(p, x2, t2, ctx4, cfg_dup=True)
    np.testing.assert_allclose(np.asarray(dup), np.asarray(stock), atol=1e-6, rtol=1e-6)

    kv4 = model.apply(p, ctx4, method="cross_kv")
    stock_kv = model.apply(p, x2, t2, ctx4, cross_kv=kv4)
    dup_kv = model.apply(p, x2, t2, ctx4, cross_kv=kv4, cfg_dup=True)
    np.testing.assert_allclose(np.asarray(dup_kv), np.asarray(stock_kv), atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(stock_kv), np.asarray(stock), atol=1e-5, rtol=1e-5)
