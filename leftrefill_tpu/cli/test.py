"""Evaluation CLI — the test_inpainting.py / test_multiview_inpainting.py
equivalent.

Behavioural reference: /root/reference/test_inpainting.py:56-205 — flags
(--model_path --exp_name --test_path --mask_path --cfg --eta --test_size
 --metric_size --batch_size --save_single --metric_output), fixed seeds,
composite pred into the unmasked region, crop the right half, PSNR/SSIM/LPIPS,
save grids or single pngs, write metric_outputs/<exp>.txt; the multiview
variant (test_multiview_inpainting.py:58-233) uses InpaintingMultiViewDataset
with view-aware reshaping.

Usage:
  python -m leftrefill_tpu.cli.test --model_path check_points/run1 --exp_name run1 --test_path data/masked_pairs
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Config")
    p.add_argument("--model_path", required=True, type=str, help="experiment dir with model_config.yaml + ckpts/")
    p.add_argument("--exp_name", default=None, type=str)
    p.add_argument("--test_path", default="data/masked_pairs", type=str)
    p.add_argument("--mask_path", default=None, type=str)
    p.add_argument("--sd_ckpt", default=None, type=str, help="frozen SD weights (torch ckpt)")
    p.add_argument("--cfg", default=2.5, type=float)
    p.add_argument("--eta", default=1.0, type=float)
    p.add_argument("--ddim_steps", default=50, type=int)
    p.add_argument("--test_size", default=512, type=int)
    p.add_argument("--metric_size", default=512, type=int)
    p.add_argument("--batch_size", default=1, type=int)
    p.add_argument("--limit", default=0, type=int, help="cap #batches (0 = all)")
    p.add_argument("--manual_pairs_x4", action="store_true",
                   help="run each sample 4x (test_inpainting.py:132-137)")
    p.add_argument("--save_single", action="store_true")
    p.add_argument("--multiview", action="store_true")
    p.add_argument("--output_path", default="./outputs", type=str)
    p.add_argument("--metric_output", default="./metric_outputs", type=str)
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--lpips_weights", default=None, type=str)
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from leftrefill_tpu.config import build_model_from_config
    from leftrefill_tpu.data.datasets import InpaintingMultiViewDataset, TestInpaintingDataset
    from leftrefill_tpu.data.loader import DataLoader, flatten_views
    from leftrefill_tpu.eval.metrics import composite_metrics
    from leftrefill_tpu.tasks import build_task
    from leftrefill_tpu.train.checkpoints import CheckpointManager, restore_over_base
    from leftrefill_tpu.train.logger import to_uint8

    model_cfg = os.path.join(args.model_path, "model_config.yaml")
    bundle = build_model_from_config(model_cfg)
    task = build_task(bundle)
    dc = bundle.data_config

    # params: fresh/SD base + newest trained prompt ckpt overlaid
    sd_sd = None
    if args.sd_ckpt and os.path.exists(args.sd_ckpt):
        from leftrefill_tpu.convert.torch_to_flax import load_torch_state_dict

        sd_sd = load_torch_state_dict(args.sd_ckpt)
    latent = (args.test_size // 8, args.test_size // 4)
    params = task.init_params(jax.random.PRNGKey(args.seed), sd_state_dict=sd_sd, latent_hw=latent)
    ckpt_dir = os.path.join(args.model_path, "ckpts")
    if os.path.exists(os.path.join(ckpt_dir, "manifest.json")):
        mgr = CheckpointManager(ckpt_dir)
        name = mgr.best_name() or "last"
        restored = mgr.restore(name)
        params, _, _ = restore_over_base(params, restored)
        print(f"Restored trained weights from {name}")

    ds_kwargs = dict(
        img_size=args.test_size,
        token_map=dc.get("token_map"),
        repeat_sp_token=dc.get("repeat_sp_token", 0),
        sp_token=dc.get("sp_token"),
    )
    if args.multiview:
        dataset = InpaintingMultiViewDataset(
            image_path=args.test_path, pair_path=None, mask_path=args.mask_path,
            mode="test", view_num=dc.get("view_num", 4),
            view_token_len=dc.get("view_token_len", 30), **ds_kwargs,
        )
    else:
        dataset = TestInpaintingDataset(
            root_path=args.test_path, mask_path=args.mask_path, **ds_kwargs
        )
    loader = DataLoader(
        dataset, args.batch_size, tokenizer=bundle.cond_bundle.tokenizer,
        drop_last=False, num_workers=4,
    )

    lpips_fn = None
    if args.lpips_weights:
        from leftrefill_tpu.eval.lpips import LPIPS, load_lpips_weights

        lp = LPIPS()
        lp_params = {"params": load_lpips_weights(args.lpips_weights)}
        lpips_fn = jax.jit(lambda a, b: lp.apply(lp_params, a, b))

    exp = args.exp_name or os.path.basename(args.model_path.rstrip("/"))
    out_dir = os.path.join(args.output_path, f"{exp}_{args.test_size}")
    os.makedirs(out_dir, exist_ok=True)
    jcomposite = jax.jit(composite_metrics)

    psnr, ssim, lpips_vals = [], [], []
    for bi, batch in enumerate(loader):
        if args.multiview and batch["image"].ndim == 5:
            batch = flatten_views(batch)
        if args.manual_pairs_x4:
            batch = {
                k: np.repeat(v, 4, axis=0) if isinstance(v, np.ndarray) else v
                for k, v in batch.items()
            }
        log = task.log_images(
            batch=batch, params=params, ddim_steps=args.ddim_steps,
            ddim_eta=args.eta, unconditional_guidance_scale=args.cfg,
            key=jax.random.PRNGKey(args.seed + bi),
        )
        reference_views = log.pop("reference", None)
        pred = np.asarray(log["pred"], np.float32)
        pred = pred.reshape(-1, *pred.shape[-3:])
        origin = np.asarray(log["origin_image"], np.float32).reshape(pred.shape)
        mask = np.asarray(log["mask"], np.float32).reshape(pred.shape[:-1] + (1,))
        if args.metric_size < args.test_size:
            # area-downsample before metrics (test_inpainting.py:142-146)
            import cv2

            scale = args.metric_size / args.test_size

            def _area(x):
                return np.stack(
                    [
                        cv2.resize(im, None, fx=scale, fy=scale, interpolation=cv2.INTER_AREA)
                        for im in x
                    ]
                )

            pred, origin = _area(pred), _area(origin)
            mask = _area(mask[..., 0])[..., None]
        m = jcomposite(jnp.asarray(pred), jnp.asarray(origin), jnp.asarray(mask))
        psnr.extend(np.asarray(m["psnr"]).tolist())
        ssim.extend(np.asarray(m["ssim"]).tolist())
        comp = np.asarray(m["composite"])
        origin_r = origin[:, :, origin.shape[2] // 2 :]
        if lpips_fn is not None:
            lpips_vals.extend(np.asarray(lpips_fn(jnp.asarray(comp), jnp.asarray(origin_r))).tolist())

        # save grids / singles (test_inpainting.py:168-198)
        if args.save_single:
            for i in range(comp.shape[0]):
                Image.fromarray(to_uint8(comp[i])).save(
                    os.path.join(out_dir, f"{bi:06}_{i}.png")
                )
        else:
            masked = np.asarray(log["masked_image"]).reshape(pred.shape)
            rows = [
                np.concatenate([to_uint8(masked[i]), to_uint8(pred[i]), to_uint8(origin[i])], axis=0)
                for i in range(pred.shape[0])
            ]
            Image.fromarray(np.concatenate(rows, axis=1)).save(
                os.path.join(out_dir, f"{bi:06}.png")
            )
            if reference_views is not None:
                # per-view reference strips (test_multiview_inpainting.py:189-197:
                # make_grid(ref, nrow=1) per source view)
                ref = np.asarray(reference_views, np.float32)
                for idx in range(ref.shape[1]):
                    strip = np.concatenate([to_uint8(r) for r in ref[:, idx]], axis=0)
                    Image.fromarray(strip).save(
                        os.path.join(out_dir, f"{bi:06}_ref{idx}.png")
                    )
        if args.limit and bi + 1 >= args.limit:
            break

    print("EXP:", exp)
    print("PSNR:", float(np.mean(psnr)))
    print("SSIM:", float(np.mean(ssim)))
    if lpips_vals:
        print("LPIPS:", float(np.mean(lpips_vals)))
    os.makedirs(args.metric_output, exist_ok=True)
    with open(os.path.join(args.metric_output, f"{exp}_{args.test_size}.txt"), "w") as w:
        w.write("PSNR:" + str(np.mean(psnr)) + "\n")
        w.write("SSIM:" + str(np.mean(ssim)) + "\n")
        if lpips_vals:
            w.write("LPIPS:" + str(np.mean(lpips_vals)) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
