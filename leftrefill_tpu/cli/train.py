"""Training CLI — the train_inpainting.py equivalent.

Behavioural reference: /root/reference/train_inpainting.py:46-141 —
argparse flags (--config_file --exp_name --save_path --restore ...), two-file
config scheme (training yaml + model yaml), SD-checkpoint restore with the
prompt-only resave dance, InpaintingLogger/ModelCheckpoint/LRMonitor
callbacks, PL Trainer loop with DDP.

TPU-native: one jitted DP train step over Mesh(('data',)); the batch is
sharded across local devices, BalancedRandomSampler shards across hosts;
bf16 compute replaces fp16+GradScaler (no loss scaling needed).

Usage:
  python -m leftrefill_tpu.cli.train --config_file configs/ref_inpainting_training_config.yaml --exp_name run1
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import jax
import jax.numpy as jnp
import numpy as np
import yaml


REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
DEFAULT_CONFIG = os.path.join(REPO_ROOT, "configs", "ref_inpainting_training_config.yaml")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Config")
    p.add_argument(
        "--config_file", default=DEFAULT_CONFIG, type=str,
        help="training config yaml (default: the shipped 1-ref config)",
    )
    p.add_argument("--exp_name", default=None, type=str, required=True)
    p.add_argument("--save_path", default="./check_points", type=str)
    p.add_argument("--nchip", default=0, type=int, help="device count (0 = all local)")
    p.add_argument("--restore", action="store_true", help="resume from last ckpt")
    p.add_argument("--no_restore", action="store_true", help="skip loading the SD checkpoint")
    p.add_argument("--bf16", action="store_true", default=True, help="bf16 compute (default)")
    p.add_argument("--max_steps", default=None, type=int, help="override max steps")
    p.add_argument("--seed", default=42, type=int)
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    exp_dir = os.path.join(args.save_path, args.exp_name)

    if args.restore:
        config = yaml.safe_load(open(os.path.join(exp_dir, "training_config.yaml")))
        model_config_path = os.path.join(exp_dir, "model_config.yaml")
    else:
        config = yaml.safe_load(open(args.config_file))
        model_config_path = config["model_config"]
        if not os.path.isabs(model_config_path) and not os.path.exists(model_config_path):
            # training configs name the model config relative to the repo
            # root (reference convention); resolve from the config file's dir
            cand = os.path.normpath(
                os.path.join(os.path.dirname(os.path.abspath(args.config_file)), "..", model_config_path)
            )
            if os.path.exists(cand):
                model_config_path = cand
        os.makedirs(exp_dir, exist_ok=True)
        # copy configs for reproducibility (train_inpainting.py:110-113)
        shutil.copy(args.config_file, os.path.join(exp_dir, "training_config.yaml"))
        shutil.copy(model_config_path, os.path.join(exp_dir, "model_config.yaml"))

    from leftrefill_tpu.config import build_model_from_config
    from leftrefill_tpu.data.datasets import (
        BalancedRandomSampler,
        InpaintingCrossViewDataset,
        InpaintingDataset,
        InpaintingMultiViewDataset,
        NVS_OBJDataset,
    )
    from leftrefill_tpu.data.loader import DataLoader, flatten_views
    from leftrefill_tpu.models.lora import default_target, extended_target, init_lora
    from leftrefill_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from leftrefill_tpu.tasks import MultiViewRefInpaintTask, NVSTask, build_task
    from leftrefill_tpu.train.checkpoints import (
        CheckpointManager,
        nvs_prompt_filter,
        prompt_only_filter,
        restore_over_base,
        save_pruned,
    )
    from leftrefill_tpu.train.logger import (
        ImageLogger,
        MetricLogger,
        StepTimer,
        TokenDriftLogger,
    )
    from leftrefill_tpu.train.trainer import (
        OptimizerConfig,
        create_train_state,
        current_lr,
        make_train_step,
        prompt_only_predicate,
        reduce_metrics_across_hosts,
    )

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    bundle = build_model_from_config(model_config_path, dtype=dtype)
    task = build_task(bundle)
    is_mv = isinstance(task, MultiViewRefInpaintTask)
    is_nvs = isinstance(task, NVSTask)

    # ------------------------------------------------------------------
    # parameters: fresh init (+ SD overlay), or restore over base
    key = jax.random.PRNGKey(args.seed)
    img_size = bundle.data_config.get("img_size", 512)
    latent_hw = (img_size // 8, img_size // 4)  # stitched canvas: H x 2W
    sd_sd = None
    resume_path = config.get("resume_path")
    if resume_path and os.path.exists(resume_path) and not args.no_restore:
        from leftrefill_tpu.convert.torch_to_flax import load_torch_state_dict

        print(f"Loading frozen weights from {resume_path}")
        sd_sd = load_torch_state_dict(resume_path)
    params = task.init_params(key, sd_state_dict=sd_sd, latent_hw=latent_hw)

    ckpt_filter = nvs_prompt_filter if is_nvs else prompt_only_filter
    mgr = CheckpointManager(
        os.path.join(exp_dir, "ckpts"),
        monitor=f'val/{config.get("monitor", "lpips")}',
        top_k=config.get("save_top_k", 2),
    )
    start_step = 0
    if args.restore and mgr.manifest["last"] is not None:
        restored = mgr.restore("last")
        params, _, _ = restore_over_base(params, restored)
        start_step = mgr.manifest["last"]["step"]
        print(f"Restored prompt weights at step {start_step}")

    # LoRA (NVS only, NVS_ldm.py:154-168): factors train alongside the prompt
    lora = None
    lora_scale = 1.0
    if is_nvs and bundle.lora_config.get("do_lora"):
        target = (
            extended_target
            if bundle.lora_config.get("lora_type") == "extended"
            else default_target
        )
        lora = init_lora(
            params["unet"], rank=bundle.lora_config.get("lora_rank", 16), target=target
        )
        lora_scale = bundle.lora_config.get("lora_scale", 1.0)
        print(f"LoRA enabled over {len(lora)} kernels")

    # ------------------------------------------------------------------
    # optimizer: AdamW over the trainable groups only
    oc = config.get("optim_cfg", {})
    opt_config = OptimizerConfig(
        lr=oc.get("learning_rate", 3e-5),
        weight_decay=oc.get("weight_decay", 0.01),
        use_cosine=oc.get("lr_scheduler") == "cosine",
        cosine_decay_steps=config.get("max_steps") or 10000,
        cosine_alpha=oc.get("eta_min", 0.0),
        accumulate_grad_batches=config.get("accumulate_grad_batches") or 1,
    )
    predicate = (
        (lambda keys: nvs_prompt_filter(keys)) if is_nvs else prompt_only_predicate
    )
    if lora is not None:
        from leftrefill_tpu.train.trainer import lora_predicate, wrap_lora_params

        params = wrap_lora_params(params, lora)
        predicate = lora_predicate(predicate)
    state, tx = create_train_state(params, opt_config, predicate)
    cond_builder = None
    if is_nvs:
        # NVS conditioning: pose token overwrite + training CFG dropout +
        # optional refinement c_input (NVS_ldm.py get_input)
        def cond_builder(p, batch, c_key):
            return task.build_cond(p, batch, train=True, cfg_key=c_key)

    step_fn = make_train_step(
        bundle.model, tx, view_reduced=task.view_reduced, view_num=task.view_num,
        lora_scale=lora_scale, cond_builder=cond_builder,
    )

    def eval_params(p):
        from leftrefill_tpu.train.trainer import _effective_params

        return _effective_params(bundle.model, p, lora_scale)

    # ------------------------------------------------------------------
    # data
    dc = dict(bundle.data_config)
    dc.pop("cfg", None)
    cfg_scale = bundle.data_config.get("cfg", 2.5)
    n_host = jax.process_count()
    host = jax.process_index()
    mesh = make_mesh(args.nchip or None)
    n_local = int(np.prod(mesh.devices.shape))
    per_host_batch = config.get("batch_size", 8) * n_local

    if is_nvs or dc.pop("obj_dataset", False):
        train_ds = NVS_OBJDataset(
            datapath=config["datapath"], listfile=config["train_list"], mode="train", **dc
        )
        val_ds = NVS_OBJDataset(
            datapath=config["datapath"], listfile=config["val_list"], mode="val", **dc
        )
        sampler = None
    elif config.get("cross_view_inpainting", True):
        ds_cls = InpaintingMultiViewDataset if is_mv else InpaintingCrossViewDataset
        train_ds = ds_cls(
            image_path=config["image_path"], pair_path=config["train_pair"],
            mask_path=config["train_mask_path"], mode="train", **dc,
        )
        val_ds = ds_cls(
            image_path=config["val_image_path"], pair_path=None,
            mask_path=config["val_mask_path"], mode="val", **dc,
        )
        sampler = BalancedRandomSampler(
            train_ds.image_dict, train_ds.pairs,
            n_sample_per_scene=config.get("n_sample_per_scene", 150),
            rank=host, num_replicas=n_host,
        )
    else:
        train_ds = InpaintingDataset(
            image_path=config["image_path"], mask_path=config["train_mask_path"],
            mode="train", **dc,
        )
        val_ds = InpaintingDataset(
            image_path=config["val_image_path"], mask_path=None, mode="val", **dc
        )
        sampler = None

    tok = bundle.cond_bundle.tokenizer
    train_loader = DataLoader(
        train_ds, per_host_batch, sampler=sampler, tokenizer=tok, shuffle=sampler is None
    )
    val_loader = DataLoader(val_ds, batch_size=4, tokenizer=tok, drop_last=True)

    # ------------------------------------------------------------------
    # loggers
    mlog = MetricLogger(exp_dir)
    ilog = ImageLogger(os.path.join(exp_dir, "samples"), config.get("logger_freq", 200))
    base_tree = params["model"] if "lora" in params and "model" in params else params
    drift = TokenDriftLogger(np.asarray(base_tree["cond"]["special_embeddings"]))
    timer = StepTimer(trace_dir=os.path.join(exp_dir, "traces") if config.get("profile") else None)

    max_epochs = config.get("max_epochs", 10)
    max_steps = args.max_steps or config.get("max_steps") or float("inf")
    step = start_step

    with mesh:
        state = replicate(mesh, state)
        for epoch in range(max_epochs):
            train_loader.set_epoch(epoch)
            if is_nvs:
                task.update_mask_curriculum(train_ds, step)
            for batch in train_loader:
                if is_mv and batch["image"].ndim == 5:
                    batch = flatten_views(batch)
                timer.start(step)
                sb = shard_batch(mesh, {k: v for k, v in batch.items() if k != "txt"})
                state, metrics = step_fn(state, sb, jax.random.fold_in(key, step))
                dt = timer.stop(step)
                if step % 50 == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    m["lr"] = current_lr(opt_config, step)
                    m["step_time_s"] = dt
                    sp_tree = state.params["model"] if "lora" in state.params and "model" in state.params else state.params
                    m.update(drift.drift(np.asarray(sp_tree["cond"]["special_embeddings"])))
                    mlog.log(step, m)
                if ilog.should_log(step) and host == 0:
                    log = task.log_images(
                        eval_params(state.params), batch, N=min(2, batch["image"].shape[0] if not is_mv else 2),
                        ddim_steps=config.get("log_ddim_steps", 50),
                        unconditional_guidance_scale=cfg_scale,
                    )
                    # 'reference' ([B, V-1, ...]) has a different row count
                    # than the per-view keys; the test CLI saves it as strips
                    ilog.log(step, epoch, {k: np.asarray(v).reshape(-1, *np.asarray(v).shape[-3:]) for k, v in log.items() if k != "reference"})
                step += 1
                if step >= max_steps:
                    break

            # validation (check_val_every_n_epoch, validation_step semantics)
            if epoch % config.get("check_val_every_n_epoch", 1) == 0:
                vals = []
                # val_batches: explicit smoke-test cap; set to null/None in the
                # config to validate the FULL loader like the reference
                # (ref_inpainting_ldm.py:119-146)
                val_cap = config.get("val_batches", 8)
                for i, vb in enumerate(val_loader):
                    if is_mv and vb["image"].ndim == 5:
                        vb = flatten_views(vb)
                    vals.append(
                        task.validation_metrics(
                            eval_params(state.params), vb, cfg_scale=cfg_scale,
                            ddim_steps=config.get("val_ddim_steps", 50),
                        )
                    )
                    if val_cap is not None and i + 1 >= val_cap:
                        break
                vmean = {k: float(np.mean([v[k] for v in vals])) for k in vals[0]} if vals else {}
                # sync_dist equivalent: average across hosts BEFORE top-k
                # checkpoint selection (ref_inpainting_ldm.py:142-144)
                vmean = reduce_metrics_across_hosts(vmean)
                mlog.log(step, vmean)
                print(f"Epoch {epoch}: {vmean}")
                if host == 0:
                    save_pruned(
                        mgr, step, jax.device_get(state.params),
                        save_prompt_only=bundle.save_prompt_only,
                        metrics=vmean, filter_fn=ckpt_filter,
                    )
            if step >= max_steps:
                break

    print("Training done at step", step)
    return 0


if __name__ == "__main__":
    sys.exit(main())
