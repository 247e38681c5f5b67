"""End-to-end ref-inpainting pipeline test with a tiny randomly-initialized
model bundle (reference flow: ref_inpainting_gradio.py:82-138)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leftrefill_tpu.diffusion.core import LeftRefillModel
from leftrefill_tpu.diffusion.schedules import DiffusionSchedule
from leftrefill_tpu.models.autoencoder import AutoencoderKL, DDConfig
from leftrefill_tpu.models.clip import PromptCLIPEmbedder, build_prompt_tokenizer
from leftrefill_tpu.models.unet import UNetModel
from leftrefill_tpu.pipeline import RefInpaintPipeline, stitch_canvas


def build_tiny_bundle(key=0, n_special=4):
    """Tiny but structurally-complete bundle: 4x-downsampling VAE, 9-channel
    UNet, 2-layer CLIP."""
    unet = UNetModel(
        in_channels=9, model_channels=16, out_channels=4, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_head_channels=8,
        context_dim=24,
    )
    vae = AutoencoderKL(
        ddconfig=DDConfig(z_channels=4, resolution=64, ch=16, ch_mult=(1, 2), num_res_blocks=1),
        embed_dim=4,
    )
    clip = PromptCLIPEmbedder(
        vocab_size=49408, width=24, heads=2, layers=2, num_special_tokens=n_special,
    )
    schedule = DiffusionSchedule.create(
        timesteps=1000, beta_schedule="linear", linear_start=0.00085, linear_end=0.0120
    )
    model = LeftRefillModel(unet=unet, vae=vae, cond_model=clip, schedule=schedule)

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key), 3)
    x_img = jnp.zeros((1, 32, 64, 3))
    params = {
        "unet": jax.jit(unet.init)(
            k1, jnp.zeros((1, 8, 16, 9)), jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 24))
        )["params"],
        "vae": jax.jit(vae.init)(k2, x_img)["params"],
        "cond": jax.jit(clip.init)(k3, jnp.zeros((1, 77), jnp.int32))["params"],
    }
    return model, params


@pytest.fixture(scope="module")
def pipeline():
    model, params = build_tiny_bundle()
    tok, sp, _ = build_prompt_tokenizer([f"<special-token{i}>" for i in range(4)], None)
    return RefInpaintPipeline(
        model=model, params=params, tokenizer=tok, special_tokens=sp,
        ddim_steps=4, guidance_scale=2.5, eta=1.0,
    )


@pytest.mark.slow
def test_pipeline_end_to_end(pipeline):
    rng = np.random.RandomState(0)
    reference = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    source = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    mask_right = np.ones((1, 32, 32, 1), np.float32)
    image, mask = stitch_canvas(reference, source, mask_right)
    assert image.shape == (1, 32, 64, 3)
    assert mask[:, :, :32].sum() == 0  # left (reference) never masked

    out = pipeline(image, mask, jax.random.PRNGKey(0))
    out = np.asarray(out)
    assert out.shape == (1, 32, 64, 3)
    assert np.isfinite(out).all()
    # outside the hole the composite must be exactly the input canvas
    assert np.allclose(out[:, :, :32], image[:, :, :32], atol=1e-6)
    # inside the hole the prediction must differ from the (unmasked) source
    assert not np.allclose(out[:, :, 32:], image[:, :, 32:])
    assert out.min() >= -1.0 and out.max() <= 1.0

    right = pipeline.inpaint_right_half(image, mask, jax.random.PRNGKey(0))
    assert right.shape == (1, 32, 32, 3)


def test_pipeline_deterministic_given_key(pipeline):
    rng = np.random.RandomState(1)
    ref = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    src = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    image, mask = stitch_canvas(ref, src, np.ones((1, 32, 32, 1), np.float32))
    o1 = np.asarray(pipeline(image, mask, jax.random.PRNGKey(7)))
    o2 = np.asarray(pipeline(image, mask, jax.random.PRNGKey(7)))
    o3 = np.asarray(pipeline(image, mask, jax.random.PRNGKey(8)))
    assert np.allclose(o1, o2)
    assert not np.allclose(o1, o3)  # eta=1.0 -> key changes the sample




@pytest.mark.slow
def test_pipeline_dpm_sampler():
    """The opt-in dpm++2m fast path (samplers_extra.py) runs through the
    same pipeline contract: composited canvas, outside-mask pixels exact."""
    model, params = build_tiny_bundle()
    tok, sp, _ = build_prompt_tokenizer([f"<special-token{i}>" for i in range(4)], None)
    pipe = RefInpaintPipeline(
        model=model, params=params, tokenizer=tok, special_tokens=sp,
        ddim_steps=4, guidance_scale=2.5, eta=0.0, sampler="dpm++2m",
    )
    rng = np.random.RandomState(1)
    b, s = 1, 32
    image = rng.uniform(-1, 1, (b, s, 2 * s, 3)).astype(np.float32)
    mask = np.concatenate(
        [np.zeros((b, s, s, 1)), np.ones((b, s, s, 1))], axis=2
    ).astype(np.float32)
    out = np.asarray(pipe(image, mask, jax.random.PRNGKey(0)))
    assert out.shape == image.shape
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out * (1 - mask), image * (1 - mask), atol=1e-5)
