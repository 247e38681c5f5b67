"""VAE shape/structure tests (reference: ldm/models/autoencoder.py,
ldm/modules/diffusionmodules/model.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leftrefill_tpu.models.autoencoder import (
    AutoencoderKL,
    DDConfig,
    DiagonalGaussian,
)

TINY = DDConfig(z_channels=4, resolution=64, ch=32, ch_mult=(1, 2), num_res_blocks=1)


@pytest.fixture(scope="module")
def tiny_vae():
    model = AutoencoderKL(ddconfig=TINY, embed_dim=4)
    x = jnp.zeros((1, 32, 64, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    return model, params


def test_encode_decode_shapes(tiny_vae):
    model, params = tiny_vae
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 64, 3))
    moments = jax.jit(lambda x: model.apply(params, x, method=model.encode_moments))(x)
    # 2 levels -> 2x downsample; double_z -> 2*embed_dim channels
    assert moments.shape == (1, 16, 32, 8)
    post = DiagonalGaussian(moments)
    z = post.sample()
    assert z.shape == (1, 16, 32, 4)
    rec = jax.jit(lambda z: model.apply(params, z, method=model.decode))(z)
    assert rec.shape == (1, 32, 64, 3)
    assert jnp.isfinite(rec).all()


def test_diagonal_gaussian_determinism():
    """sample() without key is deterministic (the reference hard-seeds torch to
    42 on every call, distributions.py:36-38)."""
    moments = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 8))
    p = DiagonalGaussian(moments)
    s1, s2 = p.sample(), p.sample()
    assert np.allclose(np.asarray(s1), np.asarray(s2))
    s3 = p.sample(jax.random.PRNGKey(7))
    assert not np.allclose(np.asarray(s1), np.asarray(s3))
    # mode() == mean
    assert np.allclose(np.asarray(p.mode()), np.asarray(p.mean))


def test_diagonal_gaussian_logvar_clamp():
    mean = jnp.zeros((1, 2, 2, 1))
    logvar = jnp.full((1, 2, 2, 1), 100.0)
    p = DiagonalGaussian(jnp.concatenate([mean, logvar], axis=-1))
    assert float(p.logvar.max()) == 20.0
    p2 = DiagonalGaussian(jnp.concatenate([mean, -logvar], axis=-1))
    assert float(p2.logvar.min()) == -30.0


def test_vae_param_names(tiny_vae):
    _, params = tiny_vae
    p = params["params"]
    enc, dec = p["encoder"], p["decoder"]
    for k in ("conv_in", "mid_block_1", "mid_attn_1", "mid_block_2", "norm_out", "conv_out"):
        assert k in enc and k in dec
    assert "down_0_block_0" in enc and "down_0_downsample" in enc
    assert "up_1_block_0" in dec and "up_1_upsample" in dec
    assert "quant_conv" in p and "post_quant_conv" in p


def test_quant_decoder_close_to_fp_and_tree_compatible():
    """AutoencoderKL(quant_decoder=True): decoder res-block convs carry int8
    kernels via quantize_params_like (same torch-key layout), output close to
    the fp decoder; conv_in/conv_out stay fp."""
    import jax
    import jax.numpy as jnp

    from leftrefill_tpu.ops.quant import quantize_params_like

    fp = AutoencoderKL(ddconfig=TINY, embed_dim=4, dtype=jnp.float32)
    q = AutoencoderKL(ddconfig=TINY, embed_dim=4, dtype=jnp.float32, quant_decoder=True)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3), jnp.float32)
    params = jax.jit(fp.init)(jax.random.PRNGKey(0), x)["params"]
    q_struct = jax.eval_shape(q.init, jax.random.PRNGKey(0), x)["params"]
    qparams = quantize_params_like(q_struct, params)

    dec = qparams["decoder"]
    assert dec["up_1_block_0"]["conv1"]["kernel"].dtype == jnp.int8
    assert dec["up_1_upsample"]["conv"]["kernel"].dtype == jnp.int8
    assert dec["conv_in"]["kernel"].dtype == jnp.float32
    assert dec["conv_out"]["kernel"].dtype == jnp.float32
    assert qparams["encoder"]["conv_in"]["kernel"].dtype == jnp.float32

    z = jnp.asarray(np.random.RandomState(1).randn(1, 16, 16, 4), jnp.float32)
    fp_out = np.asarray(jax.jit(lambda p, z: fp.apply({"params": p}, z, method=fp.decode))(params, z))
    q_out = np.asarray(jax.jit(lambda p, z: q.apply({"params": p}, z, method=q.decode))(qparams, z))
    rel = np.abs(q_out - fp_out).max() / np.abs(fp_out).max()
    assert np.isfinite(q_out).all()
    assert rel < 0.1, rel
