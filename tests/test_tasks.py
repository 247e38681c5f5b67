"""Task-layer tests: config -> task -> init/log/validate/train on tiny dims
(reference: ref_inpainting_ldm.py, multiview_ref_inpainting_ldm.py, NVS_ldm.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from leftrefill_tpu.config import build_model_from_config
from leftrefill_tpu.tasks import MultiViewRefInpaintTask, NVSTask, RefInpaintTask, build_task

TINY_YAML = """
model:
  target: inpainting_ldm.ref_inpainting_ldm.RefInpaintLDM
  params:
    linear_start: 0.00085
    linear_end: 0.0120
    timesteps: 1000
    conditioning_key: hybrid
    scale_factor: 0.18215
    unet_config:
      target: ldm.modules.diffusionmodules.openaimodel.UNetModel
      params:
        in_channels: 9
        out_channels: 4
        model_channels: 16
        attention_resolutions: [1]
        num_res_blocks: 1
        channel_mult: [1, 2]
        num_head_channels: 8
        context_dim: 24
    first_stage_config:
      target: ldm.models.autoencoder.AutoencoderKL
      params:
        embed_dim: 4
        ddconfig: {double_z: true, z_channels: 4, resolution: 64, in_channels: 3,
                   out_ch: 3, ch: 16, ch_mult: [1, 2], num_res_blocks: 1,
                   attn_resolutions: [], dropout: 0.0}
    cond_stage_config:
      target: ldm.modules.encoders.Refill_modules.PromptCLIPEmbedder
      params:
        layer: penultimate
        special_tokens: ["repeat_4_<special-token>"]
        init_text: ["two views of one scene"]
        width: 24
        heads: 2
        layers: 2
    data_config: {img_size: 32, cfg: 2.5, sp_token: "<special-token>", repeat_sp_token: 4}
    save_prompt_only: true
"""


def unzero_kernels(params, key=0, scale=0.02):
    """Fresh models have zero-init output convs/projections (zero_module
    semantics) which block all gradient flow; real training starts from SD
    weights.  For gradient tests, fill zero kernels with small noise."""
    rng = np.random.RandomState(key)

    def fix(leaf):
        arr = np.asarray(leaf)
        if arr.ndim >= 2 and arr.size and np.all(arr == 0):
            return jnp.asarray(rng.randn(*arr.shape).astype(arr.dtype) * scale)
        return leaf

    return jax.tree_util.tree_map(fix, params)


@pytest.fixture(scope="module")
def task():
    cfg = yaml.safe_load(TINY_YAML)
    bundle = build_model_from_config(cfg, dtype=jnp.float32)
    t = build_task(bundle)
    assert isinstance(t, RefInpaintTask)
    params = t.init_params(jax.random.PRNGKey(0), latent_hw=(8, 16))
    params = unzero_kernels(params)
    return t, params


def _batch(t, b=2, s=32):
    rng = np.random.RandomState(0)
    image = rng.uniform(-1, 1, (b, s, 2 * s, 3)).astype(np.float32)
    mask = np.concatenate(
        [np.zeros((b, s, s, 1)), np.ones((b, s, s, 1))], axis=2
    ).astype(np.float32)
    prompt = " ".join(t.special_tokens)
    return {
        "image": image,
        "mask": mask,
        "masked_image": image * (mask < 0.5),
        "tokens": t.prompt_tokens([prompt] * b),
    }


def test_special_embedding_text_init(task):
    """special_embeddings rows initialized to the mean init-text embedding
    (Refill_modules.py:29-56)."""
    t, params = task
    table = np.asarray(params["cond"]["token_embedding"])
    ids = t.tokenizer.encode("two views of one scene")
    expected = table[np.asarray(ids)].mean(axis=0)
    sp = np.asarray(params["cond"]["special_embeddings"])
    assert sp.shape == (4, 24)
    for i in range(4):
        assert np.allclose(sp[i], expected, atol=1e-6)


@pytest.mark.slow
def test_log_images_and_validation(task):
    t, params = task
    batch = _batch(t)
    log = t.log_images(params, batch, ddim_steps=4, unconditional_guidance_scale=2.5)
    assert log["pred"].shape == (2, 32, 64, 3)
    assert np.isfinite(np.asarray(log["pred"])).all()
    metrics = t.validation_metrics(params, batch, cfg_scale=2.5, ddim_steps=4)
    assert "val/psnr" in metrics and "val/ssim" in metrics
    assert np.isfinite(metrics["val/psnr"])

    # cfg == 0 branch (uncond-only sampling, ref_inpainting_ldm.py:54-60)
    log0 = t.log_images(params, batch, ddim_steps=2, unconditional_guidance_scale=0.0)
    assert np.isfinite(np.asarray(log0["pred"])).all()


@pytest.mark.slow
def test_log_images_diagnostic_rows(task):
    """Round-3 (VERDICT item 8): the base-class diagnostic surface —
    diffusion_row (ddpm.py:1201-1214), denoise_row (:1221-1224) and
    progressive_row (:1065-1104) — behind opt-in flags."""
    t, params = task
    batch = _batch(t)
    log = t.log_images(
        params, batch, ddim_steps=4, unconditional_guidance_scale=2.5,
        plot_diffusion_rows=True, plot_denoise_rows=True, plot_progressive_rows=True,
    )
    b, h, w = 2, 32, 64
    # diffusion_row: t in {0, 200, ..., 800, 999} -> 6 stops
    assert log["diffusion_row"].shape == (6, b, h, w, 3)
    # denoise_row: min(8, ddim_steps)=4 pred_x0 stops
    assert log["denoise_row"].shape == (4, b, h, w, 3)
    # progressive_row: num_timesteps//(num_timesteps//5) = 5 chunks
    assert log["progressive_row"].shape == (5, b, h, w, 3)
    for k in ("diffusion_row", "denoise_row", "progressive_row"):
        arr = np.asarray(log[k])
        assert np.isfinite(arr).all()
        assert arr.min() >= -1.0 and arr.max() <= 1.0
    # heavily-noised diffusion stops differ from the clean decode
    d = np.abs(np.asarray(log["diffusion_row"][0]) - np.asarray(log["diffusion_row"][-1]))
    assert d.max() > 0.01


@pytest.mark.slow
def test_train_step_moves_only_prompt(task):
    from leftrefill_tpu.train.trainer import (
        OptimizerConfig,
        create_train_state,
        make_train_step,
    )

    t, params = task
    batch = _batch(t)
    state, tx = create_train_state(params, OptimizerConfig(lr=1e-3))
    step = make_train_step(t.model, tx, donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    d_sp = np.abs(
        np.asarray(new_state.params["cond"]["special_embeddings"])
        - np.asarray(params["cond"]["special_embeddings"])
    ).max()
    d_unet = max(
        np.abs(np.asarray(a) - np.asarray(b)).max()
        for a, b in zip(
            jax.tree_util.tree_leaves(new_state.params["unet"]),
            jax.tree_util.tree_leaves(params["unet"]),
        )
    )
    assert d_sp > 0
    assert d_unet == 0
    # the movement must come from a real gradient, not just AdamW weight
    # decay: the grad w.r.t. the prompt table is nonzero
    from leftrefill_tpu.train.trainer import compute_loss

    g = jax.jit(
        lambda p, b: jax.grad(lambda q: compute_loss(t.model, q, b, jax.random.PRNGKey(0))[0])(p)
    )(params, batch)
    assert np.abs(np.asarray(g["cond"]["special_embeddings"])).max() > 0


@pytest.mark.slow
def test_lora_train_step(task):
    """LoRA factors train alongside the prompt; merged kernels differ from
    base after the step (NVS optimizer-group semantics, NVS_ldm.py:314-345)."""
    from leftrefill_tpu.models.lora import default_target, init_lora
    from leftrefill_tpu.train.trainer import (
        OptimizerConfig,
        _effective_params,
        create_train_state,
        lora_predicate,
        make_train_step,
        prompt_only_predicate,
        wrap_lora_params,
    )

    t, params = task
    batch = _batch(t)
    lora = init_lora(params["unet"], rank=2, target=default_target, key=jax.random.PRNGKey(1))
    pack = wrap_lora_params(params, lora)
    state, tx = create_train_state(
        pack, OptimizerConfig(lr=1e-2), lora_predicate(prompt_only_predicate)
    )
    step = make_train_step(t.model, tx, donate=False, lora_scale=1.0)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    k0 = next(iter(lora))
    d_up = np.abs(np.asarray(new_state.params["lora"][k0]["up"]) - np.asarray(lora[k0]["up"])).max()
    assert d_up > 0, "LoRA up factor did not receive gradient"
    # frozen UNet kernels untouched; merged (effective) kernels changed
    d_frozen = np.abs(
        np.asarray(new_state.params["model"]["unet"]["out_2"]["kernel"])
        - np.asarray(params["unet"]["out_2"]["kernel"])
    ).max()
    assert d_frozen == 0
    eff = _effective_params(t.model, new_state.params, 1.0)
    path = k0.split("/")
    base_k, eff_k = params["unet"], eff["unet"]
    for s in path:
        base_k, eff_k = base_k[s], eff_k[s]
    assert np.abs(np.asarray(eff_k) - np.asarray(base_k)).max() > 0


@pytest.mark.slow
def test_prompt_only_checkpoint_roundtrip(task, tmp_path):
    from leftrefill_tpu.train.checkpoints import (
        CheckpointManager,
        filter_tree,
        prompt_only_filter,
        restore_over_base,
        save_pruned,
    )

    t, params = task
    mgr = CheckpointManager(str(tmp_path / "ckpts"), monitor="val/lpips", top_k=2)
    save_pruned(mgr, 10, params, save_prompt_only=True, metrics={"val/lpips": 0.5})
    save_pruned(mgr, 20, params, save_prompt_only=True, metrics={"val/lpips": 0.3})
    save_pruned(mgr, 30, params, save_prompt_only=True, metrics={"val/lpips": 0.9})
    assert mgr.best_name() == "step_20"
    assert len(mgr.manifest["best"]) == 2  # top-2 kept

    restored = mgr.restore("last")
    # only the prompt table is in the pruned ckpt
    flat = jax.tree_util.tree_leaves(restored)
    assert len(flat) == 1
    # merge back over a fresh base (the last_resave dance)
    base = t.init_params(jax.random.PRNGKey(1), latent_hw=(8, 16))
    merged, missing, unexpected = restore_over_base(base, restored)
    assert np.allclose(
        np.asarray(merged["cond"]["special_embeddings"]),
        np.asarray(params["cond"]["special_embeddings"]),
    )
    assert not unexpected


@pytest.mark.slow
def test_deep_prompt_uncond_tokens_shape():
    """Deep-prompt uncond must be [n, layers, 77] (Refill_modules.py:121-127;
    the embedder consumes [B, n_layer, L])."""
    cfg = yaml.safe_load(TINY_YAML)
    cp = cfg["model"]["params"]["cond_stage_config"]["params"]
    cp["deep_prompt"] = True
    cp["cross_attn_layers"] = 2
    bundle = build_model_from_config(cfg, dtype=jnp.float32)
    t = build_task(bundle)
    u = t.uncond_tokens(3)
    assert u.shape == (3, 2, 77)
    # and the embedder accepts it: [B, n_layer, L] -> [B, n_layer, L, width]
    params = t.init_params(jax.random.PRNGKey(0), latent_hw=(8, 16))
    out = t.model.cond_model.apply({"params": params["cond"]}, jnp.asarray(u))
    assert out.shape == (3, 2, 77, 24)


MV_TINY_YAML = TINY_YAML.replace(
    "inpainting_ldm.ref_inpainting_ldm.RefInpaintLDM",
    "inpainting_ldm.multiview_ref_inpainting_ldm.RefInpaintLDM",
).replace(
    "ldm.modules.diffusionmodules.openaimodel.UNetModel",
    "ldm.modules.diffusionmodules.multiview_unet.MultiViewUnetModel",
)


@pytest.mark.slow
def test_multiview_log_images_honors_N():
    """log_images(N) limits to N scenes (multiview_ref_inpainting_ldm.py:113)."""
    cfg = yaml.safe_load(MV_TINY_YAML)
    p = cfg["model"]["params"]
    p["view_num"] = 2
    p["reduced_loss"] = True
    p["unet_config"]["params"]["view_num"] = 2
    bundle = build_model_from_config(cfg, dtype=jnp.float32)
    t = build_task(bundle)
    assert isinstance(t, MultiViewRefInpaintTask)
    params = t.init_params(jax.random.PRNGKey(0), latent_hw=(4, 8))

    b, v, s = 2, 2, 16
    rng = np.random.RandomState(0)
    image = rng.uniform(-1, 1, (b, v, s, 2 * s, 3)).astype(np.float32)
    mask = np.zeros((b, v, s, 2 * s, 1), np.float32)
    mask[:, 0, :, s:] = 1.0
    prompt = " ".join(t.special_tokens)
    tokens = np.stack([t.prompt_tokens([prompt] * v) for _ in range(b)])
    batch = {
        "image": image,
        "mask": mask,
        "masked_image": image * (mask < 0.5),
        "tokens": tokens,
    }
    log = t.log_images(params, batch, N=1, ddim_steps=2,
                       unconditional_guidance_scale=1.0)
    # one scene, split back into v views
    assert log["pred"].shape[:2] == (1, v)
    assert log["origin_image"].shape[:2] == (1, v)
