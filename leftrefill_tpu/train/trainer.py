"""Prompt-tuning training: optimizer masking, jitted/data-parallel train step.

Behavioural reference:
- AdamW over *only* ``cond_stage_model.special_embeddings`` with optional
  cosine schedule: /root/reference/inpainting_ldm/ref_inpainting_ldm.py:83-96
- training loop semantics (t ~ U[0,1000), p_losses on latents):
  /root/reference/ldm/models/diffusion/ddpm.py:854-935
- released training config: batch 8/device, grad-accum 2, AdamW lr 3e-5
  wd 0.01, fp16 -> here bf16 (no loss scaling needed on TPU):
  check_points/ref_guided_inpainting/training_config.yaml

TPU design: the step is one jitted function over a ``Mesh(('data',))`` with
the batch sharded and parameters replicated; XLA emits the grad psum (the
NCCL-DDP equivalent).  Only the 50x1024 special-embedding table gets
optimizer state; every frozen parameter is masked out with
``optax.set_to_zero`` so optimizer memory is ~0.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from leftrefill_tpu.diffusion.core import Conditioning, LeftRefillModel

Params = Any


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 3e-5
    weight_decay: float = 0.01
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    use_cosine: bool = False
    cosine_decay_steps: int = 10000
    cosine_alpha: float = 0.0
    accumulate_grad_batches: int = 1


def trainable_mask(params: Params, predicate: Callable[[tuple], bool]):
    """Boolean pytree: True where predicate(path-key-names) holds."""

    def check(path):
        keys = tuple(
            k.key if hasattr(k, "key") else getattr(k, "name", str(k)) for k in path
        )
        return predicate(keys)

    return jax.tree_util.tree_map_with_path(lambda p, _: check(p), params)


def prompt_only_predicate(path_keys: tuple) -> bool:
    """Train only the special-embeddings table (ref_inpainting_ldm.py:83-96).
    NVS extends this with lora/sep/refinement groups (NVS_ldm.py:314-345)."""
    return "special_embeddings" in path_keys


def make_optimizer(config: OptimizerConfig, mask) -> optax.GradientTransformation:
    if config.use_cosine:
        schedule = optax.cosine_decay_schedule(
            init_value=config.lr,
            decay_steps=config.cosine_decay_steps,
            alpha=config.cosine_alpha,
        )
    else:
        schedule = config.lr
    adamw = optax.adamw(
        learning_rate=schedule,
        b1=config.b1,
        b2=config.b2,
        eps=config.eps,
        weight_decay=config.weight_decay,
    )
    tx = optax.multi_transform(
        {"train": adamw, "frozen": optax.set_to_zero()},
        jax.tree_util.tree_map(lambda m: "train" if m else "frozen", mask),
    )
    if config.accumulate_grad_batches > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=config.accumulate_grad_batches)
    return tx


def current_lr(config: OptimizerConfig, step: int) -> float:
    """The lr actually applied at trainer step ``step`` (the reference logs
    it via LearningRateMonitor, train_inpainting.py:107 — r2 logged the
    constant config lr even under the cosine schedule).  With gradient
    accumulation the schedule advances once per optimizer update, not per
    micro-batch."""
    if not config.use_cosine:
        return config.lr
    eff = step // max(config.accumulate_grad_batches, 1)
    return float(
        optax.cosine_decay_schedule(
            init_value=config.lr,
            decay_steps=config.cosine_decay_steps,
            alpha=config.cosine_alpha,
        )(eff)
    )


def reduce_metrics_across_hosts(metrics: dict) -> dict:
    """Mean of scalar metrics over all hosts (the reference's
    ``sync_dist=True``, ref_inpainting_ldm.py:142-144) so multi-host
    checkpoint selection isn't rank-0-biased.  No-op on a single host."""
    if jax.process_count() == 1 or not metrics:
        return metrics
    import numpy as np
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    arr = np.asarray([float(metrics[k]) for k in keys], np.float32)
    gathered = np.asarray(multihost_utils.process_allgather(arr))
    return {k: float(gathered[:, i].mean()) for i, k in enumerate(keys)}


@dataclasses.dataclass
class TrainState:
    params: Params
    opt_state: Any
    step: jax.Array


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step), None),
    lambda _, ch: TrainState(*ch),
)


def create_train_state(
    params: Params,
    config: OptimizerConfig = OptimizerConfig(),
    predicate: Callable[[tuple], bool] = prompt_only_predicate,
) -> tuple[TrainState, optax.GradientTransformation]:
    # W8A8 trees are inference-only (advisor r2): jnp.round in
    # quantize_activation has zero gradient and int8 kernels are leaves, so a
    # quantized tree under differentiation would silently train on
    # zero/meaningless gradients.  Refuse up front.
    bad = [
        jax.tree_util.keystr(path)
        for path, leaf in jax.tree_util.tree_leaves_with_path(params)
        if getattr(leaf, "dtype", None) == jnp.int8
    ]
    if bad:
        raise ValueError(
            "params contain int8 (W8A8-quantized) leaves — the quantized tree "
            f"is inference-only and must not be trained: {bad[:3]}..."
        )
    mask = trainable_mask(params, predicate)
    tx = make_optimizer(config, mask)
    opt_state = tx.init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32)), tx


def wrap_lora_params(params: Params, lora: dict) -> dict:
    """Pack LoRA factors alongside the model params; the loss merges them
    into the UNet kernels at apply time (exact-equivalent of the reference's
    injected modules, models/lora.py)."""
    return {"model": params, "lora": lora}


def lora_predicate(base_predicate: Callable[[tuple], bool]) -> Callable[[tuple], bool]:
    """Trainable = all LoRA factors + whatever the base predicate selects in
    the model subtree (the NVS optimizer groups, NVS_ldm.py:314-345)."""

    def pred(keys: tuple) -> bool:
        if keys and keys[0] == "lora":
            return True
        inner = keys[1:] if keys and keys[0] == "model" else keys
        return base_predicate(inner)

    return pred


def _effective_params(model: LeftRefillModel, params: Params, lora_scale: float) -> Params:
    if isinstance(params, dict) and "lora" in params and "model" in params:
        from leftrefill_tpu.models.lora import merge_lora

        eff = dict(params["model"])
        eff["unet"] = merge_lora(params["model"]["unet"], params["lora"], lora_scale)
        return eff
    return params


def compute_loss(
    model: LeftRefillModel,
    params: Params,
    batch: dict,
    key: jax.Array,
    view_reduced: bool = False,
    view_num: int = 1,
    lora_scale: float = 1.0,
    cond_builder=None,
) -> tuple[jax.Array, dict]:
    """One forward loss (shared_step semantics, ddpm.py:849-863, 900-935).

    batch: image [B,H,W,C] in [-1,1], mask [B,H,W,1] (1=hole),
    masked_image [B,H,W,C], tokens [B,77] int32.
    ``view_reduced``: multi-view mode — per-view loss reshaped (b v) and only
    view 0 (the target) kept (multiview_ref_inpainting_ldm.py:38-91).
    """
    params = _effective_params(model, params, lora_scale)
    t_key, n_key, c_key = jax.random.split(key, 3)
    z = model.encode_first_stage(params, batch["image"])
    if cond_builder is not None:
        # task-specific conditioning (NVS: pose token + CFG dropout + c_input,
        # NVS_ldm.py get_input)
        cond = cond_builder(params, batch, c_key)
    else:
        cond = model.build_inpaint_cond(
            params, batch["tokens"], batch["mask"], batch["masked_image"]
        )
    b = z.shape[0]
    t = jax.random.randint(t_key, (b,), 0, model.schedule.num_timesteps)
    noise = jax.random.normal(n_key, z.shape, z.dtype)
    if not view_reduced:
        return model.p_losses(params, z, cond, t, noise)
    err = model.p_losses(params, z, cond, t, noise, per_element=True)
    err = err.reshape(b // view_num, view_num, *err.shape[1:])
    loss_simple = err[:, 0].mean(axis=(1, 2, 3))  # target view only
    loss = loss_simple.mean()
    return loss, {"loss_simple": loss, "loss": loss}


def make_train_step(
    model: LeftRefillModel,
    tx: optax.GradientTransformation,
    view_reduced: bool = False,
    view_num: int = 1,
    donate: bool = True,
    lora_scale: float = 1.0,
    cond_builder=None,
):
    """Build the jitted train step.  Under a Mesh with the batch sharded over
    'data' and params replicated, jit emits the grad all-reduce.  When
    state.params is a {'model':…, 'lora':…} pack, LoRA factors train too."""

    def step(state: TrainState, batch: dict, key: jax.Array):
        def loss_fn(p):
            return compute_loss(
                model, p, batch, key,
                view_reduced=view_reduced, view_num=view_num, lora_scale=lora_scale,
                cond_builder=cond_builder,
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_opt, state.step + 1)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
