"""Full-SD2-config converter key accounting (round-5 VERDICT #4).

test_golden_parity.py proves the converter's key map *numerically* on small
configs; this test proves it *covers the complete real checkpoint* at the
full shipped configuration (configs/ref_inpainting.yaml = the reference's
configs/ref_inpainting.yaml:22-76): the 865M UNet
(openaimodel.py:412-787), the f8 AutoencoderKL (model.py:453-654 +
autoencoder.py:33-34), and the ViT-H-14 OpenCLIP text tower
(Refill_modules.py:91-204).  Nothing is executed — the reference modules are
constructed on torch's meta device for their state_dict name/shape inventory,
and our parameter trees come from ``jax.eval_shape`` of each module's init —
so ckpt-day has no unmapped/missing-key surprises.

The OpenCLIP text tower itself is not importable here (zero-egress env), so
its state_dict inventory is synthesized from the ViT-H-14 text config
(width 1024, 24 layers, heads 16, vocab 49408, context 77 — open_clip
model card / Refill_modules.py:103 ``arch="ViT-H-14"``), including the
keys the embedder never uses and the converter must SKIP
(text_projection, logit_scale, attn_mask — map_clip_key returns None).
"""

from __future__ import annotations

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "ldm")), reason="reference checkout absent"
)

from leftrefill_tpu.convert.torch_to_flax import convert_state_dict


@pytest.fixture(scope="module")
def ref_mods():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name in ("torchvision", "torchvision.utils", "torchvision.transforms"):
        sys.modules.setdefault(name, types.ModuleType(name))
    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")
        om.__path__ = []
        om.OmegaConf = type("OmegaConf", (), {})
        om.ListConfig = list
        om.DictConfig = dict
        lc = types.ModuleType("omegaconf.listconfig")
        lc.ListConfig = list
        sys.modules["omegaconf"] = om
        sys.modules["omegaconf.listconfig"] = lc
    import ldm.modules.diffusionmodules.model as vae_model
    import ldm.modules.diffusionmodules.openaimodel as openaimodel

    return types.SimpleNamespace(openaimodel=openaimodel, vae_model=vae_model)


def _clip_text_tower_inventory() -> dict[str, tuple[int, ...]]:
    """ViT-H-14 text tower state_dict (post ``del model.visual``,
    Refill_modules.py:106), name->shape."""
    W, L, V, CTX, MLP = 1024, 24, 49408, 77, 4096
    inv: dict[str, tuple[int, ...]] = {
        "positional_embedding": (CTX, W),
        "text_projection": (W, W),
        "logit_scale": (),
        "token_embedding.weight": (V, W),
        "ln_final.weight": (W,),
        "ln_final.bias": (W,),
        "attn_mask": (CTX, CTX),
    }
    for i in range(L):
        p = f"transformer.resblocks.{i}."
        inv[p + "ln_1.weight"] = (W,)
        inv[p + "ln_1.bias"] = (W,)
        inv[p + "attn.in_proj_weight"] = (3 * W, W)
        inv[p + "attn.in_proj_bias"] = (3 * W,)
        inv[p + "attn.out_proj.weight"] = (W, W)
        inv[p + "attn.out_proj.bias"] = (W,)
        inv[p + "ln_2.weight"] = (W,)
        inv[p + "ln_2.bias"] = (W,)
        inv[p + "mlp.c_fc.weight"] = (MLP, W)
        inv[p + "mlp.c_fc.bias"] = (MLP,)
        inv[p + "mlp.c_proj.weight"] = (W, MLP)
        inv[p + "mlp.c_proj.bias"] = (W,)
    return inv


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        q = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, q))
        else:
            out[q] = tuple(np.shape(v))
    return out


#: keys in the real ckpt the converter must skip: schedule buffers we
#: recompute (ddpm.py register_buffer) + CLIP pieces the embedder never uses
EXPECTED_SKIPPED_SUFFIXES = (
    "betas",
    "alphas_cumprod",
    "alphas_cumprod_prev",
    "cond_stage_model.model.text_projection",
    "cond_stage_model.model.logit_scale",
    "cond_stage_model.model.attn_mask",
)


def test_full_sd2_config_key_accounting(ref_mods):
    # -- reference inventory (meta device: names + shapes, no memory) --------
    with torch.device("meta"):
        unet_t = ref_mods.openaimodel.UNetModel(
            image_size=32, use_spatial_transformer=True,
            use_linear_in_transformer=True, legacy=False, use_checkpoint=False,
            in_channels=9, out_channels=4, model_channels=320,
            attention_resolutions=[4, 2, 1], num_res_blocks=2,
            channel_mult=[1, 2, 4, 4], num_head_channels=64,
            transformer_depth=1, context_dim=1024,
        )
        dd = dict(
            double_z=True, z_channels=4, resolution=256, in_channels=3,
            out_ch=3, ch=128, ch_mult=(1, 2, 4, 4), num_res_blocks=2,
            attn_resolutions=[], dropout=0.0,
        )
        enc_t = ref_mods.vae_model.Encoder(**dd)
        dec_t = ref_mods.vae_model.Decoder(**dd)
        quant_t = torch.nn.Conv2d(8, 8, 1)
        post_quant_t = torch.nn.Conv2d(4, 4, 1)

    sd: dict[str, np.ndarray] = {}

    def add(prefix, torch_sd):
        for k, v in torch_sd.items():
            sd[prefix + k] = np.zeros(tuple(v.shape), np.float32)

    add("model.diffusion_model.", unet_t.state_dict())
    add("first_stage_model.encoder.", enc_t.state_dict())
    add("first_stage_model.decoder.", dec_t.state_dict())
    add("first_stage_model.quant_conv.", quant_t.state_dict())
    add("first_stage_model.post_quant_conv.", post_quant_t.state_dict())
    for k, shape in _clip_text_tower_inventory().items():
        sd["cond_stage_model.model." + k] = np.zeros(shape, np.float32)
    sd["cond_stage_model.special_embeddings.weight"] = np.zeros((50, 1024), np.float32)
    # schedule buffers present in every LDM ckpt (recomputed on our side)
    for k in ("betas", "alphas_cumprod", "alphas_cumprod_prev"):
        sd[k] = np.zeros((1000,), np.float32)

    n_unet = sum(1 for k in sd if k.startswith("model.diffusion_model."))
    assert n_unet == 686, n_unet  # the 865M UNet's full key count

    converted, skipped = convert_state_dict(sd)

    # every skip is an expected one, and every expected one was skipped
    assert sorted(skipped) == sorted(
        k for k in sd if k.endswith(EXPECTED_SKIPPED_SUFFIXES)
    ), skipped

    # -- our trees (eval_shape: abstract init, no compute) -------------------
    from leftrefill_tpu.config import build_model_from_config

    bundle = build_model_from_config(
        os.path.join(os.path.dirname(__file__), "..", "configs", "ref_inpainting.yaml"),
        dtype=jnp.float32,
    )
    m = bundle.model
    h, w = 8, 16  # spatial size does not affect the param tree
    ours = {
        "unet": jax.eval_shape(
            m.unet.init,
            jax.random.PRNGKey(0),
            jnp.zeros((1, h, w, m.unet.in_channels)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, m.unet.context_dim)),
        )["params"],
        "vae": jax.eval_shape(
            m.vae.init, jax.random.PRNGKey(0), jnp.zeros((1, 8 * h, 8 * w, 3))
        )["params"],
        "cond": jax.eval_shape(
            m.cond_model.init, jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)
        )["params"],
    }

    for root in ("unet", "vae", "cond"):
        ref_flat = _flatten(converted[root])
        our_flat = _flatten(ours[root])
        missing = {k: v for k, v in our_flat.items() if k not in ref_flat}
        unexpected = {k: v for k, v in ref_flat.items() if k not in our_flat}
        assert not missing, f"{root}: ckpt does not provide {sorted(missing)[:8]}"
        assert not unexpected, f"{root}: converter produced unknown {sorted(unexpected)[:8]}"
        bad_shapes = {
            k: (ref_flat[k], our_flat[k])
            for k in ref_flat
            if ref_flat[k] != our_flat[k]
        }
        assert not bad_shapes, f"{root}: shape mismatches {list(bad_shapes.items())[:8]}"
