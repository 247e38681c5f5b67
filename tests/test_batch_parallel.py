"""Batch/CFG-parallel sampling (parallel/batch.py) on the 8-device CPU mesh.

The CFG-doubled UNet batch (uncond first, reference ddim.py:317-343) shards
over a ('data',) mesh; the full pipeline output must match the single-device
path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from leftrefill_tpu.models.clip import build_prompt_tokenizer
from leftrefill_tpu.parallel.batch import batch_parallel_apply
from leftrefill_tpu.pipeline import RefInpaintPipeline, stitch_canvas
from tests.test_pipeline import build_tiny_bundle


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("data",))


def _pipe(mesh=None, **kw):
    model, params = build_tiny_bundle()
    tok, sp, _ = build_prompt_tokenizer([f"<special-token{i}>" for i in range(4)], None)
    return RefInpaintPipeline(
        model=model, params=params, tokenizer=tok, special_tokens=sp,
        ddim_steps=4, guidance_scale=2.5, eta=1.0, mesh=mesh, **kw,
    )


def _canvas(batch=1, seed=0):
    rng = np.random.RandomState(seed)
    ref = rng.uniform(-1, 1, (batch, 32, 32, 3)).astype(np.float32)
    src = rng.uniform(-1, 1, (batch, 32, 32, 3)).astype(np.float32)
    return stitch_canvas(ref, src, np.ones((batch, 32, 32, 1), np.float32))


@pytest.mark.slow
def test_cfg_parallel_matches_single_device():
    """B=1 CFG protocol on a 2-device axis: cond/uncond branches run on
    different chips; output must match the single-device pipeline."""
    image, mask = _canvas()
    single = np.asarray(_pipe()(image, mask, jax.random.PRNGKey(3)))
    sharded = np.asarray(_pipe(mesh=_mesh(2))(image, mask, jax.random.PRNGKey(3)))
    np.testing.assert_allclose(sharded, single, atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_serving_batch_over_eight_devices():
    """A 4-canvas serving batch = 8 UNet samples under CFG, one per device."""
    image, mask = _canvas(batch=4, seed=1)
    single = np.asarray(_pipe()(image, mask, jax.random.PRNGKey(5)))
    sharded = np.asarray(_pipe(mesh=_mesh(8))(image, mask, jax.random.PRNGKey(5)))
    assert sharded.shape == (4, 32, 64, 3)
    np.testing.assert_allclose(sharded, single, atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_indivisible_batch_raises():
    model, params = build_tiny_bundle()
    apply_fn = batch_parallel_apply(model, params, _mesh(8))
    x = jnp.zeros((2, 8, 16, 9))
    from leftrefill_tpu.diffusion.core import Conditioning

    cond = Conditioning(
        c_concat=jnp.zeros((2, 8, 16, 5)), c_crossattn=jnp.zeros((2, 77, 24))
    )
    with pytest.raises(ValueError, match="divisible"):
        apply_fn(x, jnp.zeros((2,), jnp.int32), cond)


@pytest.mark.slow
def test_apply_parity_with_kv_cache():
    """batch_parallel_apply with a conditioning KV cache == plain apply_model."""
    model, params = build_tiny_bundle()
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (4, 8, 16, 4))
    ctx = jax.random.normal(jax.random.fold_in(k, 1), (4, 77, 24))
    cc = jax.random.normal(jax.random.fold_in(k, 2), (4, 8, 16, 5))
    t = jnp.array([3, 14, 159, 265], jnp.int32)
    from leftrefill_tpu.diffusion.core import Conditioning

    cond = Conditioning(c_concat=cc, c_crossattn=ctx)
    kv = model.cross_attention_kv(params, ctx)
    ref = model.apply_model(params, x, t, cond, cross_kv=kv)
    par = batch_parallel_apply(model, params, _mesh(4), cross_kv=kv)(x, t, cond)
    np.testing.assert_allclose(np.asarray(par), np.asarray(ref), atol=1e-5, rtol=1e-5)
