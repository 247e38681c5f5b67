"""Runtime helpers: persistent compilation cache config + LoRA adapter store
(serving-side adapter swap without recompilation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leftrefill_tpu.models.lora import default_target, init_lora, merge_lora
from leftrefill_tpu.runtime import LoraAdapterStore, enable_persistent_compilation_cache


def test_persistent_cache_config(tmp_path):
    import leftrefill_tpu.runtime as rt

    rt._CACHE_ENABLED = False  # order-independence: another test may have run it
    d = enable_persistent_compilation_cache(str(tmp_path / "xla"))
    assert jax.config.jax_compilation_cache_dir == d
    # idempotent: second call does not re-point the cache
    enable_persistent_compilation_cache(str(tmp_path / "other"))
    assert jax.config.jax_compilation_cache_dir == d


def _toy_base():
    return {
        "unet": {
            "blk": {"to_q": {"kernel": jnp.ones((8, 8))}},
            "other": {"kernel": jnp.zeros((4, 4))},
        },
        "cond": {"special_embeddings": jnp.zeros((4, 8))},
    }


def test_adapter_store_merge_and_cache():
    base = _toy_base()
    lora_a = init_lora(base["unet"], rank=2, key=jax.random.PRNGKey(0))
    lora_b = init_lora(base["unet"], rank=2, key=jax.random.PRNGKey(1))
    # make the deltas visible (init has up == 0 => identity merge)
    for lora in (lora_a, lora_b):
        for site in lora.values():
            site["up"] = jnp.ones_like(site["up"]) * 0.1

    store = LoraAdapterStore(base, keep=1)
    store.add("a", lora_a)
    store.add("b", lora_b)
    assert store.names() == ["a", "b"]
    assert store.params_for(None) is base

    pa = store.params_for("a")
    expect = merge_lora(base["unet"], lora_a, 1.0)
    np.testing.assert_allclose(
        np.asarray(pa["unet"]["blk"]["to_q"]["kernel"]),
        np.asarray(expect["blk"]["to_q"]["kernel"]),
    )
    # shapes identical across adapters -> no jit recompilation on swap
    pb = store.params_for("b")
    assert jax.tree_util.tree_structure(pa) == jax.tree_util.tree_structure(pb)
    # cache hit is the same object
    assert store.params_for("b") is pb
    # keep=1: "a" was evicted, re-merge produces an equal tree
    pa2 = store.params_for("a")
    np.testing.assert_allclose(
        np.asarray(pa2["unet"]["blk"]["to_q"]["kernel"]),
        np.asarray(pa["unet"]["blk"]["to_q"]["kernel"]),
    )
    with pytest.raises(KeyError):
        store.params_for("nope")


def test_adapter_store_int8_requant():
    """int8 serving path (round-5): with a quantized base + fp master, the
    store merges into the master and requantizes — the returned tree keeps
    the base's int8 structure and equals quantize(merge(master)) exactly."""
    from leftrefill_tpu.ops.quant import quantize_params_like

    rng = np.random.RandomState(0)
    master = {
        "blk": {"to_q": {"kernel": jnp.asarray(rng.randn(8, 8), jnp.float32)}},
        "other": {"kernel": jnp.asarray(rng.randn(4, 4), jnp.float32)},
    }
    # quant structure: to_q is a W8A8 site (kernel + kernel_scale siblings)
    q_struct = {
        "blk": {"to_q": {"kernel": None, "kernel_scale": None}},
        "other": {"kernel": None},
    }
    base_unet = quantize_params_like(q_struct, master)
    assert base_unet["blk"]["to_q"]["kernel"].dtype == jnp.int8
    base = {"unet": base_unet, "cond": {"special_embeddings": jnp.zeros((4, 8))}}

    lora = init_lora(master, rank=2, key=jax.random.PRNGKey(0))
    assert "blk/to_q/kernel" in lora, sorted(lora)  # non-vacuous merge
    for site in lora.values():
        site["up"] = jnp.ones_like(site["up"]) * 0.1

    store = LoraAdapterStore(base, keep=2, master_unet=master)
    store.add("a", lora)
    pa = store.params_for("a")

    expect = quantize_params_like(base_unet, merge_lora(master, lora, 1.0))
    got = pa["unet"]["blk"]["to_q"]
    assert got["kernel"].dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(got["kernel"]), np.asarray(expect["blk"]["to_q"]["kernel"]))
    np.testing.assert_allclose(
        np.asarray(got["kernel_scale"]),
        np.asarray(expect["blk"]["to_q"]["kernel_scale"]),
        rtol=1e-6,
    )
    # non-LoRA site passes through unquantized and unchanged
    np.testing.assert_allclose(
        np.asarray(pa["unet"]["other"]["kernel"]), np.asarray(master["other"]["kernel"])
    )
    # same-structure guarantee: the jitted quant pipeline accepts the swap
    assert jax.tree_util.tree_structure(pa["unet"]) == jax.tree_util.tree_structure(base["unet"])
