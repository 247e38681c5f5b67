"""Weight-converter tests: layout parity against torch ops as oracle, plus
loading the real shipped prompt-only checkpoint
(check_points/ref_guided_inpainting/ckpts/epoch=7-step=6039.ckpt)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leftrefill_tpu.convert.torch_to_flax import (
    convert_state_dict,
    load_torch_state_dict,
    map_clip_key,
    map_unet_key,
    map_vae_key,
    merge_params,
    zero_extend_input_conv,
)

torch = pytest.importorskip("torch")

REAL_CKPT = "/root/reference/check_points/ref_guided_inpainting/ckpts/epoch=7-step=6039.ckpt"


def test_conv_layout_parity():
    """torch Conv2d (NCHW/OIHW) == flax Conv (NHWC/HWIO) after conversion."""
    tconv = torch.nn.Conv2d(3, 8, 3, padding=1)
    x = np.random.RandomState(0).randn(2, 3, 6, 10).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()

    from flax import linen as nn

    fconv = nn.Conv(8, kernel_size=(3, 3), padding=((1, 1), (1, 1)))
    kernel = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    bias = tconv.bias.detach().numpy()
    out = fconv.apply(
        {"params": {"kernel": kernel, "bias": bias}}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert np.allclose(out, ref, atol=1e-5)


def test_strided_conv_layout_parity():
    """stride-2 k3 p1 (UNet Downsample) must match torch on even inputs."""
    tconv = torch.nn.Conv2d(4, 4, 3, stride=2, padding=1)
    x = np.random.RandomState(1).randn(1, 4, 8, 16).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()
    from flax import linen as nn

    fconv = nn.Conv(4, kernel_size=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    out = fconv.apply(
        {
            "params": {
                "kernel": tconv.weight.detach().numpy().transpose(2, 3, 1, 0),
                "bias": tconv.bias.detach().numpy(),
            }
        },
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    assert np.allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_vae_downsample_asymmetric_pad_parity():
    """VAE Downsample pads (0,1,0,1) then VALID conv (model.py:81-88)."""
    tconv = torch.nn.Conv2d(4, 4, 3, stride=2, padding=0)
    x = np.random.RandomState(2).randn(1, 4, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.nn.functional.pad(torch.from_numpy(x), (0, 1, 0, 1))).numpy()

    from leftrefill_tpu.models.autoencoder import VAEDownsample

    m = VAEDownsample(4)
    params = {
        "params": {
            "conv": {
                "kernel": tconv.weight.detach().numpy().transpose(2, 3, 1, 0),
                "bias": tconv.bias.detach().numpy(),
            }
        }
    }
    out = m.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert np.allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_groupnorm_parity():
    tg = torch.nn.GroupNorm(4, 8, eps=1e-6)
    with torch.no_grad():
        tg.weight.copy_(torch.linspace(0.5, 1.5, 8))
        tg.bias.copy_(torch.linspace(-1, 1, 8))
    x = np.random.RandomState(3).randn(2, 8, 4, 6).astype(np.float32)
    with torch.no_grad():
        ref = tg(torch.from_numpy(x)).numpy()

    from leftrefill_tpu.ops.layers import GroupNorm32

    m = GroupNorm32(4, eps=1e-6)
    out = m.apply(
        {
            "params": {
                "scale": tg.weight.detach().numpy(),
                "bias": tg.bias.detach().numpy(),
            }
        },
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    assert np.allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_key_mapping_examples():
    assert map_unet_key("input_blocks.1.0.in_layers.0.weight") == [
        "input_blocks_1_0", "in_layers_0", "weight",
    ]
    assert map_unet_key("input_blocks.1.1.transformer_blocks.0.ff.net.0.proj.weight") == [
        "input_blocks_1_1", "transformer_blocks_0", "ff", "net_0_proj", "weight",
    ]
    assert map_unet_key("input_blocks.1.1.transformer_blocks.0.attn1.to_out.0.bias") == [
        "input_blocks_1_1", "transformer_blocks_0", "attn1", "to_out_0", "bias",
    ]
    assert map_vae_key("encoder.down.0.block.1.nin_shortcut.weight") == [
        "encoder", "down_0_block_1", "nin_shortcut", "weight",
    ]
    assert map_vae_key("decoder.up.2.upsample.conv.bias") == [
        "decoder", "up_2_upsample", "conv", "bias",
    ]
    assert map_vae_key("encoder.mid.attn_1.q.weight") == [
        "encoder", "mid_attn_1", "q", "weight",
    ]
    assert map_clip_key("model.transformer.resblocks.3.attn.in_proj_weight") == [
        "model", "resblocks_3", "attn_in_proj", "weight",
    ]
    assert map_clip_key("model.transformer.resblocks.3.mlp.c_fc.bias") == [
        "model", "resblocks_3", "mlp_c_fc", "bias",
    ]
    assert map_clip_key("model.text_projection") is None


@pytest.mark.skipif(not os.path.exists(REAL_CKPT), reason="reference ckpt absent")
def test_load_real_prompt_checkpoint():
    """The shipped 720KB prompt-only checkpoint: 50x1024 special embeddings
    (README.md:36)."""
    sd = load_torch_state_dict(REAL_CKPT)
    assert "cond_stage_model.special_embeddings.weight" in sd, sd.keys()
    params, skipped = convert_state_dict(sd)
    table = params["cond"]["special_embeddings"]
    assert table.shape == (50, 1024)
    assert np.isfinite(table).all()
    assert np.abs(table).max() > 0


def test_merge_params_nonstrict():
    base = {"a": {"w": np.zeros((2, 2))}, "b": {"v": np.ones(3)}}
    loaded = {"a": {"w": np.ones((2, 2))}, "c": {"x": np.ones(1)}}
    merged, missing, unexpected = merge_params(base, loaded)
    assert np.all(merged["a"]["w"] == 1)
    assert np.all(merged["b"]["v"] == 1)
    assert any("b/v" in m for m in missing)
    assert any("/c" in u for u in unexpected)


def test_zero_extend_input_conv():
    k = np.random.RandomState(0).randn(3, 3, 4, 320).astype(np.float32)
    grown = zero_extend_input_conv(k, 9)
    assert grown.shape == (3, 3, 9, 320)
    assert np.all(grown[:, :, :4] == k)
    assert np.all(grown[:, :, 4:] == 0)


def test_resblock_parity_vs_torch_composition():
    """Full UNet ResBlock (openaimodel.py:162-274 semantics) vs a torch
    composition of the same spec: GN32+SiLU+Conv, +emb, GN32+SiLU+Conv,
    +1x1-skip. fp32, random weights."""
    import torch
    import torch.nn as tnn

    import jax
    import jax.numpy as jnp

    from leftrefill_tpu.models.unet import ResBlock

    cin, cout, emb_ch = 8, 16, 12
    torch.manual_seed(0)
    # group counts must match GroupNorm32's clamp for tiny channels:
    # min(32, c) -> 8 and 16 groups respectively
    gn1 = tnn.GroupNorm(8, cin)
    conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
    emb_lin = tnn.Linear(emb_ch, cout)
    gn2 = tnn.GroupNorm(16, cout)
    conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
    skip = tnn.Conv2d(cin, cout, 1)
    for m in (gn1, gn2):
        tnn.init.normal_(m.weight, 1.0, 0.1)
        tnn.init.normal_(m.bias, 0.0, 0.1)

    x = np.random.RandomState(0).randn(2, cin, 6, 10).astype(np.float32)
    emb = np.random.RandomState(1).randn(2, emb_ch).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x)
        et = torch.from_numpy(emb)
        h = conv1(tnn.functional.silu(gn1(xt)))
        h = h + emb_lin(tnn.functional.silu(et))[:, :, None, None]
        h = conv2(tnn.functional.silu(gn2(h)))
        ref = (skip(xt) + h).numpy()

    def t2f_conv(c):
        return {"kernel": c.weight.detach().numpy().transpose(2, 3, 1, 0),
                "bias": c.bias.detach().numpy()}

    params = {
        "params": {
            "in_layers_0": {"scale": gn1.weight.detach().numpy(), "bias": gn1.bias.detach().numpy()},
            "in_layers_2": t2f_conv(conv1),
            "emb_layers_1": {"kernel": emb_lin.weight.detach().numpy().T, "bias": emb_lin.bias.detach().numpy()},
            "out_layers_0": {"scale": gn2.weight.detach().numpy(), "bias": gn2.bias.detach().numpy()},
            "out_layers_3": t2f_conv(conv2),
            "skip_connection": t2f_conv(skip),
        }
    }
    m = ResBlock(out_channels=cout)
    out = jax.jit(m.apply)(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(emb))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert np.abs(out - ref).max() < 3e-5, np.abs(out - ref).max()
