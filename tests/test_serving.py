"""Headless serving-predict flow test (reference: ref_inpainting_gradio.py
predict/initialize_model, driven without the UI)."""

import numpy as np
import pytest

from tests.test_tasks import TINY_YAML


@pytest.fixture(scope="module")
def pipeline():
    import jax
    import jax.numpy as jnp
    import yaml

    from leftrefill_tpu.config import build_model_from_config
    from leftrefill_tpu.pipeline import RefInpaintPipeline
    from leftrefill_tpu.tasks import build_task

    bundle = build_model_from_config(yaml.safe_load(TINY_YAML), dtype=jnp.float32)
    task = build_task(bundle)
    params = task.init_params(jax.random.PRNGKey(0), latent_hw=(8, 16))
    return RefInpaintPipeline(
        model=bundle.model,
        params=params,
        tokenizer=bundle.cond_bundle.tokenizer,
        special_tokens=bundle.cond_bundle.special_tokens,
        ddim_steps=4,
        eta=1.0,
    )


@pytest.mark.slow
def test_headless_predict_flow(pipeline):
    from leftrefill_tpu.serving.gradio_app import pad_to_multiple, predict

    rng = np.random.RandomState(0)
    reference = rng.randint(0, 255, (40, 50, 3), np.uint8)  # odd sizes on purpose
    source = rng.randint(0, 255, (48, 44, 3), np.uint8)
    sketch = np.zeros((48, 44), np.uint8)
    sketch[10:30, 10:30] = 255

    outs = predict(
        pipeline, reference, source, sketch,
        ddim_steps=4, num_samples=2, scale=2.5, seed=7, img_size=32,
    )
    assert len(outs) == 2
    for o in outs:
        assert o.shape == (32, 32, 3)
        assert o.dtype == np.uint8
    # same seed -> identical samples per slot; different seeds differ
    outs2 = predict(
        pipeline, reference, source, sketch,
        ddim_steps=4, num_samples=2, scale=2.5, seed=7, img_size=32,
    )
    assert np.array_equal(outs[0], outs2[0])
    outs3 = predict(
        pipeline, reference, source, sketch,
        ddim_steps=4, num_samples=2, scale=2.5, seed=8, img_size=32,
    )
    assert not np.array_equal(outs[0], outs3[0])


@pytest.mark.slow
def test_predict_sampler_variant(pipeline):
    """Per-request sampler switch (the serving fast path): a dpm++2m request
    runs through the same predict flow, produces a different trajectory than
    ddim at the same seed, and caches a distinct pipeline variant."""
    from leftrefill_tpu.serving.gradio_app import pipeline_variant, predict

    rng = np.random.RandomState(1)
    reference = rng.randint(0, 255, (32, 32, 3), np.uint8)
    source = rng.randint(0, 255, (32, 32, 3), np.uint8)
    sketch = np.zeros((32, 32), np.uint8)
    sketch[8:24, 8:24] = 255

    kw = dict(ddim_steps=4, num_samples=1, scale=2.5, seed=7, img_size=32)
    out_ddim = predict(pipeline, reference, source, sketch, **kw)
    out_dpm = predict(pipeline, reference, source, sketch, sampler="dpm++2m", **kw)
    assert out_dpm[0].shape == (32, 32, 3)
    assert not np.array_equal(out_ddim[0], out_dpm[0])
    # variant caching keys on sampler: same (steps, scale) different sampler
    v1 = pipeline_variant(pipeline, 4, 2.5, "dpm++2m")
    v2 = pipeline_variant(pipeline, 4, 2.5, "dpm++2m")
    assert v1 is v2 and v1.sampler == "dpm++2m"
    assert pipeline_variant(pipeline, 4, 2.5) is pipeline  # base untouched


def test_pad_to_multiple():
    from leftrefill_tpu.serving.gradio_app import pad_to_multiple

    x = np.ones((100, 130, 3), np.uint8)
    p = pad_to_multiple(x, 64)
    assert p.shape == (128, 192, 3)
    assert np.array_equal(p[:100, :130], x)


@pytest.mark.slow
def test_predict_pads_non_64_multiple_inputs():
    """Non-/64 inputs take the edge-padding path (ref_inpainting_gradio.py:
    142-145,168-177) and the output crops back to img_size."""
    import cv2  # noqa: F401  (predict imports it)

    from leftrefill_tpu.serving.gradio_app import predict
    from tests.test_pipeline import build_tiny_bundle
    from leftrefill_tpu.models.clip import build_prompt_tokenizer
    from leftrefill_tpu.pipeline import RefInpaintPipeline

    model, params = build_tiny_bundle()
    tok, sp, _ = build_prompt_tokenizer([f"<special-token{i}>" for i in range(4)], None)
    pipe = RefInpaintPipeline(
        model=model, params=params, tokenizer=tok, special_tokens=sp,
        ddim_steps=2, guidance_scale=1.0, eta=0.0,
    )
    rng = np.random.RandomState(0)
    # img_size 40 -> VAE needs /4; pad_to_multiple(64-ish) exercised via the
    # tiny bundle's downsampling (multiple kept small through resize)
    ref = (rng.uniform(0, 255, (50, 70, 3))).astype(np.uint8)
    src = (rng.uniform(0, 255, (33, 41, 3))).astype(np.uint8)
    mask = (rng.uniform(0, 255, (33, 41))).astype(np.uint8)
    outs = predict(pipe, ref, src, mask, ddim_steps=2, num_samples=1,
                   scale=1.0, seed=1, img_size=32)
    assert len(outs) == 1
    assert outs[0].shape == (32, 32, 3)
    assert outs[0].dtype == np.uint8


@pytest.mark.slow
def test_predict_with_dp_mesh_matches_single_device():
    """Serving with the CFG/batch-parallel mesh (--dp): same predict contract
    and identical output vs the unsharded pipeline at the same seed."""
    import dataclasses

    import numpy as np

    from leftrefill_tpu.parallel.mesh import make_mesh
    from leftrefill_tpu.serving.gradio_app import predict

    import jax
    import jax.numpy as jnp
    import yaml

    from leftrefill_tpu.config import build_model_from_config
    from leftrefill_tpu.pipeline import RefInpaintPipeline
    from leftrefill_tpu.tasks import build_task

    bundle = build_model_from_config(yaml.safe_load(TINY_YAML), dtype=jnp.float32)
    task = build_task(bundle)
    params = task.init_params(jax.random.PRNGKey(0), latent_hw=(8, 16))
    base = RefInpaintPipeline(
        model=bundle.model,
        params=params,
        tokenizer=bundle.cond_bundle.tokenizer,
        special_tokens=bundle.cond_bundle.special_tokens,
        ddim_steps=4,
        eta=1.0,
    )
    dp = dataclasses.replace(base, mesh=make_mesh(2))

    rng = np.random.RandomState(1)
    reference = rng.randint(0, 255, (32, 32, 3), np.uint8)
    source = rng.randint(0, 255, (32, 32, 3), np.uint8)
    sketch = np.zeros((32, 32), np.uint8)
    sketch[8:24, 8:24] = 255

    kw = dict(ddim_steps=4, num_samples=1, scale=2.5, seed=9, img_size=32)
    out_single = predict(base, reference, source, sketch, **kw)
    out_dp = predict(dp, reference, source, sketch, **kw)
    assert out_dp[0].shape == out_single[0].shape
    # uint8 quantization absorbs the tiny cross-device reduction reordering
    diff = np.abs(out_dp[0].astype(int) - out_single[0].astype(int))
    assert diff.max() <= 1, diff.max()
