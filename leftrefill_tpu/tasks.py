"""Task models (the reference's Lightning-module layer, reimplemented as
functional task objects).

Behavioural reference:
- RefInpaintLDM (1-ref): /root/reference/inpainting_ldm/ref_inpainting_ldm.py:16-173
  (log_images CFG branches >1 / ==0 / else, sample_log latent shape from
  c_concat, prompt-only AdamW, PSNR/SSIM/LPIPS validation on the composited
  right half)
- RefInpaintLDM (multi-view): multiview_ref_inpainting_ldm.py:18-289
  (5-D batch flattening, view-0-reduced loss, per-view log splits)
- NVSLDM: NVS_ldm.py:107-435 (refinement c_input, rel-pose conditioning,
  multi-cond sampling, optimizer groups, mask-rate warmup curriculum)

Each task wraps a config-built ModelBundle; everything device-side is jitted
with static shapes and cached per (batch, steps, scale) signature.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from leftrefill_tpu.config import ModelBundle
from leftrefill_tpu.diffusion.core import Conditioning
from leftrefill_tpu.diffusion.ddim import ddim_multi_sample, ddim_sample
from leftrefill_tpu.eval.metrics import composite_metrics
from leftrefill_tpu.models.clip import init_special_embeddings
from leftrefill_tpu.models.nvs import RefinementCNN

Params = Any


class RefInpaintTask:
    """Reference-guided inpainting (1 reference)."""

    def __init__(self, bundle: ModelBundle):
        self.bundle = bundle
        self.model = bundle.model
        self.tokenizer = bundle.cond_bundle.tokenizer
        self.special_tokens = bundle.cond_bundle.special_tokens
        self._jit_cache: dict = {}

    # ------------------------------------------------------------------
    # parameters

    def init_params(
        self,
        key: jax.Array,
        sd_state_dict: Optional[dict] = None,
        latent_hw: tuple[int, int] = (64, 128),
    ) -> Params:
        """Random-init all towers, then overlay converted SD weights if given
        (torch_init_model semantics), then initialize special_embeddings from
        the init text (Refill_modules.py:29-56)."""
        m = self.model
        ks = jax.random.split(key, 4)
        h, w = latent_hw
        # the multi-view UNet folds views out of the batch axis: init with a
        # batch of view_num rows
        b = self.view_num if not self.bundle.concat_target else max(self.view_num - 1, 1)
        params = {
            "unet": jax.jit(m.unet.init)(
                ks[0],
                jnp.zeros((b, h, w, m.unet.in_channels)),
                jnp.zeros((b,), jnp.int32),
                jnp.zeros((b, 77, m.unet.context_dim)),
            )["params"],
            "vae": jax.jit(m.vae.init)(ks[1], jnp.zeros((1, 8 * h, 8 * w, 3)))["params"],
            "cond": self._init_cond(ks[2]),
        }
        if sd_state_dict is not None:
            from leftrefill_tpu.convert.torch_to_flax import convert_state_dict, merge_params

            loaded, _ = convert_state_dict(sd_state_dict)
            params, missing, unexpected = merge_params(params, loaded)
            if missing:
                print(f"[init] {len(missing)} params missing from checkpoint")
            if unexpected:
                print(f"[init] {len(unexpected)} unexpected checkpoint keys")
        params = self._init_special_embeddings(params)
        return params

    def _init_cond(self, key: jax.Array):
        cm = self.model.cond_model
        if getattr(cm, "deep_prompt", False):
            tok = jnp.zeros((1, cm.cross_attn_layers, 77), jnp.int32)
        else:
            tok = jnp.zeros((1, 77), jnp.int32)
        return jax.jit(cm.init)(key, tok)["params"]

    def _init_special_embeddings(self, params: Params) -> Params:
        cb = self.bundle.cond_bundle
        if cb.init_text is None or (cb.init_text and cb.init_text[0] == "<random>"):
            return params
        table = np.asarray(params["cond"]["token_embedding"])
        w = init_special_embeddings(
            self.tokenizer, cb.special_tokens, table, cb.init_text, cb.tokenwise_init
        )
        params = dict(params)
        params["cond"] = dict(params["cond"])
        params["cond"]["special_embeddings"] = jnp.asarray(w)
        return params

    # ------------------------------------------------------------------
    # conditioning helpers

    def prompt_tokens(self, txt) -> np.ndarray:
        from leftrefill_tpu.data.loader import tokenize_txt

        if isinstance(txt, (list, tuple)) and txt and not isinstance(txt[0], str):
            return np.stack([tokenize_txt(self.tokenizer, t) for t in txt])
        if isinstance(txt, (list, tuple)) and txt and isinstance(txt[0], str):
            return self.tokenizer.tokenize(list(txt))
        return self.tokenizer.tokenize(txt)

    def uncond_tokens(self, n: int) -> np.ndarray:
        """get_unconditional_conditioning: empty prompt
        (ref_inpainting_ldm.py:30-35).  Deep-prompt mode replicates the empty
        prompt per cross-attention layer -> [n, layers, 77], the token layout
        PromptCLIPEmbedder expects (Refill_modules.py:121-127)."""
        t = self.tokenizer.tokenize("")  # [1, 77]
        if getattr(self.model.cond_model, "deep_prompt", False):
            layers = self.model.cond_model.cross_attn_layers
            per_layer = np.repeat(t, layers, axis=0)  # [layers, 77]
            return np.repeat(per_layer[None], n, axis=0)  # [n, layers, 77]
        return np.repeat(t, n, axis=0)

    # ------------------------------------------------------------------
    # sampling / logging

    def _log_fn(self, ddim_steps: int, eta: float, guidance_scale: float):
        sig = ("log", ddim_steps, eta, guidance_scale)
        if sig not in self._jit_cache:

            def fn(params, image, mask, masked_image, tokens, uncond_tok, key):
                m = self.model
                cond = m.build_inpaint_cond(params, tokens, mask, masked_image)
                b, h, w, _ = cond.c_concat.shape
                shape = (b, h, w, m.unet.out_channels)
                tables = m.schedule.ddim_tables(ddim_steps, eta=eta)
                apply_fn = lambda x, t, c: m.apply_model(params, x, t, c)
                if guidance_scale > 1.0:
                    uc = Conditioning(
                        c_concat=cond.c_concat,
                        c_crossattn=m.get_learned_conditioning(params, uncond_tok),
                    )
                    z = ddim_sample(
                        m, apply_fn, tables, cond, key, shape,
                        uncond=uc, guidance_scale=guidance_scale,
                    )
                elif guidance_scale == 0.0:
                    uc = Conditioning(
                        c_concat=cond.c_concat,
                        c_crossattn=m.get_learned_conditioning(params, uncond_tok),
                    )
                    z = ddim_sample(m, apply_fn, tables, uc, key, shape)
                else:
                    z = ddim_sample(m, apply_fn, tables, cond, key, shape)
                pred = m.decode_first_stage(params, z)
                return jnp.clip(pred, -1.0, 1.0)

            self._jit_cache[sig] = jax.jit(fn)
        return self._jit_cache[sig]

    def _diag_fn(self, ddim_steps: int, eta: float, guidance_scale: float, which: tuple):
        """Diagnostic rows (LatentDiffusion.log_images, ddpm.py:1163-1291):
        diffusion_row (input latent q_sampled over the schedule, :1201-1214),
        denoise_row (pred_x0 intermediates of the DDIM loop, :1221-1224),
        progressive_row (x0 partials of the full DDPM loop, :1065-1104 via
        progressive_denoising).  Each returned as [n_steps, B, H, W, 3]."""
        sig = ("diag", ddim_steps, eta, guidance_scale, which)
        if sig not in self._jit_cache:
            log_every_t = 200
            n_keep = 8

            def decode_stack(params, zs):
                m = self.model
                k, b = zs.shape[0], zs.shape[1]
                flat = zs.reshape(k * b, *zs.shape[2:])
                dec = m.decode_first_stage(params, flat)
                return jnp.clip(dec, -1.0, 1.0).reshape(k, b, *dec.shape[1:])

            def fn(params, image, mask, masked_image, tokens, uncond_tok, key):
                m = self.model
                cond = m.build_inpaint_cond(params, tokens, mask, masked_image)
                b, h, w, _ = cond.c_concat.shape
                shape = (b, h, w, m.unet.out_channels)
                tables = m.schedule.ddim_tables(ddim_steps, eta=eta)
                apply_fn = lambda x, t, c: m.apply_model(params, x, t, c)
                uc = Conditioning(
                    c_concat=cond.c_concat,
                    c_crossattn=m.get_learned_conditioning(params, uncond_tok),
                ) if guidance_scale > 1.0 else None
                out = {}
                if "diffusion" in which:
                    z = m.encode_first_stage(params, image)
                    n_t = m.schedule.num_timesteps
                    ts = list(range(0, n_t, log_every_t)) + [n_t - 1]
                    zs = []
                    for i, t_ in enumerate(ts):
                        tt = jnp.full((b,), t_, jnp.int32)
                        noise = jax.random.normal(
                            jax.random.fold_in(key, 1000 + i), z.shape, z.dtype
                        )
                        zs.append(m.q_sample(z, tt, noise))
                    out["diffusion_row"] = decode_stack(params, jnp.stack(zs))
                if "denoise" in which:
                    _, inter = ddim_sample(
                        m, apply_fn, tables, cond, key, shape,
                        uncond=uc, guidance_scale=guidance_scale,
                        return_intermediates=True,
                    )
                    idx = np.linspace(0, ddim_steps - 1, min(n_keep, ddim_steps)).astype(int)
                    out["denoise_row"] = decode_stack(params, inter["pred_x0"][idx])
                if "progressive" in which:
                    from leftrefill_tpu.diffusion.samplers_extra import ddpm_sample

                    _, x0s = ddpm_sample(
                        m, apply_fn, cond, key, shape,
                        uncond=uc, guidance_scale=guidance_scale,
                        return_x0_every=max(m.schedule.num_timesteps // 5, 1),
                    )
                    out["progressive_row"] = decode_stack(params, x0s)
                return out

            self._jit_cache[sig] = jax.jit(fn)
        return self._jit_cache[sig]

    def log_images(
        self,
        params: Params,
        batch: dict,
        N: Optional[int] = None,
        ddim_steps: int = 50,
        ddim_eta: float = 0.0,
        unconditional_guidance_scale: float = 9.0,
        key: Optional[jax.Array] = None,
        plot_diffusion_rows: bool = False,
        plot_denoise_rows: bool = False,
        plot_progressive_rows: bool = False,
    ) -> dict:
        """log_images (ref_inpainting_ldm.py:38-72): returns pred /
        origin_image / masked_image, NHWC [-1,1].  The plot_* flags add the
        base-class diagnostic rows (ddpm.py:1163-1291) as
        diffusion_row / denoise_row / progressive_row [S, B, H, W, 3]."""
        n = N or batch["image"].shape[0]
        image = jnp.asarray(batch["image"][:n])
        mask = jnp.asarray(batch["mask"][:n])
        masked = jnp.asarray(batch["masked_image"][:n])
        tokens = jnp.asarray(batch["tokens"][:n])
        key = key if key is not None else jax.random.PRNGKey(42)
        fn = self._log_fn(ddim_steps, ddim_eta, unconditional_guidance_scale)
        uncond_tok = jnp.asarray(self.uncond_tokens(n))
        pred = fn(params, image, mask, masked, tokens, uncond_tok, key)
        out = {"pred": pred, "origin_image": image, "masked_image": masked, "mask": mask}
        which = tuple(
            name
            for name, on in (
                ("diffusion", plot_diffusion_rows),
                ("denoise", plot_denoise_rows),
                ("progressive", plot_progressive_rows),
            )
            if on
        )
        if which:
            diag = self._diag_fn(ddim_steps, ddim_eta, unconditional_guidance_scale, which)
            out.update(diag(params, image, mask, masked, tokens, uncond_tok, key))
        return out

    # ------------------------------------------------------------------
    # validation (ref_inpainting_ldm.py:119-146)

    def validation_metrics(
        self,
        params: Params,
        batch: dict,
        cfg_scale: float,
        lpips_fn=None,
        ddim_steps: int = 50,
        key: Optional[jax.Array] = None,
    ) -> dict:
        log = self.log_images(
            params, batch, ddim_steps=ddim_steps,
            unconditional_guidance_scale=cfg_scale, key=key,
        )
        m = jax.jit(composite_metrics)(log["pred"], log["origin_image"], log["mask"])
        out = {
            "val/psnr": float(np.mean(np.asarray(m["psnr"]))),
            "val/ssim": float(np.mean(np.asarray(m["ssim"]))),
        }
        if lpips_fn is not None:
            # LPIPS on the composited right half in [-1,1]
            comp = m["composite"]
            w = log["origin_image"].shape[2]
            origin_r = log["origin_image"][:, :, w // 2 :]
            out["val/lpips"] = float(np.mean(np.asarray(lpips_fn(comp, origin_r))))
        return out

    # ------------------------------------------------------------------
    # training loss hook (used by make_train_step via compute_loss)

    @property
    def view_reduced(self) -> bool:
        return False

    @property
    def view_num(self) -> int:
        return 1


class MultiViewRefInpaintTask(RefInpaintTask):
    """Multi-view variant (multiview_ref_inpainting_ldm.py:18-289): 5-D
    batches flattened to (B*V), reduced loss on view 0, per-view log splits,
    multi-cond consistent test sampling."""

    @property
    def view_reduced(self) -> bool:
        return self.bundle.reduced_loss

    @property
    def view_num(self) -> int:
        return self.bundle.view_num

    def flatten_batch(self, batch: dict) -> dict:
        from leftrefill_tpu.data.loader import flatten_views

        return flatten_views(batch)

    def log_images(self, params, batch, N=None, **kw) -> dict:
        """N limits the number of *scenes* logged (each scene spans v flat
        rows), honoring multiview_ref_inpainting_ldm.py:113."""
        flat = self.flatten_batch(batch) if batch["image"].ndim == 5 else batch
        v = self.view_num if not self.bundle.concat_target else self.view_num - 1
        n_rows = None if N is None else min(N, flat["image"].shape[0] // v) * v
        log = super().log_images(params, flat, N=n_rows, **kw)
        # split per view: [B*V,...] -> [B,V,...] (multiview_ref_inpainting_ldm.py:113-178)
        out = {}
        for k, val in log.items():
            arr = np.asarray(val)
            out[k] = arr.reshape(arr.shape[0] // v, v, *arr.shape[1:])
        # the reference log also emits the source views as 'reference'
        # ([B, V-1, H, W, C]; view 0 is the masked target) — the multiview
        # test CLI saves these as per-view strips
        # (test_multiview_inpainting.py:189-197)
        if not self.bundle.concat_target and out["origin_image"].shape[1] > 1:
            out["reference"] = out["origin_image"][:, 1:]
        return out

    def multi_cond_sample(
        self,
        params: Params,
        conds: Conditioning,
        unconds: Optional[Conditioning],
        shape: tuple[int, ...],
        guidance_scale: float,
        ddim_steps: int = 50,
        eta: float = 0.0,
        key: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Test-time multi-reference consistent sampling (ddim.py:146-222)."""
        m = self.model
        tables = m.schedule.ddim_tables(ddim_steps, eta=eta)
        apply_fn = lambda x, t, c: m.apply_model(params, x, t, c)
        key = key if key is not None else jax.random.PRNGKey(42)
        return ddim_multi_sample(
            m, apply_fn, tables, conds, key, shape,
            unconds=unconds, guidance_scale=guidance_scale,
        )


class NVSTask(RefInpaintTask):
    """Novel view synthesis (NVS_ldm.py:107-435)."""

    def __init__(self, bundle: ModelBundle):
        super().__init__(bundle)
        self.refinement = (
            RefinementCNN(model_channels=self.model.unet.model_channels)
            if bundle.refinement_config.get("use_input_refinement")
            else None
        )
        self.mask_steps = 0  # mask-rate warmup curriculum (NVS_ldm.py:299-306)

    def init_params(self, key, sd_state_dict=None, latent_hw=(32, 64)):
        params = super().init_params(key, sd_state_dict, latent_hw)
        if self.refinement is not None:
            h, w = latent_hw
            params["refine"] = jax.jit(self.refinement.init)(
                jax.random.fold_in(key, 7),
                jnp.zeros((1, 8 * h, 8 * w, 3)),
                jnp.zeros((1, 8 * h, 8 * w, 1)),
            )["params"]
        return params

    def _init_cond(self, key):
        return jax.jit(self.model.cond_model.init)(
            key, jnp.zeros((1, 77), jnp.int32), jnp.zeros((1, 4))
        )["params"]

    def build_cond(
        self,
        params: Params,
        batch: dict,
        train: bool = False,
        cfg_key: Optional[jax.Array] = None,
    ) -> Conditioning:
        """get_input (NVS_ldm.py:170-193): inpaint concat + pose-conditioned
        crossattn + optional refinement c_input."""
        m = self.model
        from leftrefill_tpu.ops.layers import nearest_resize

        masked = jnp.asarray(batch["masked_image"])
        mask = jnp.asarray(batch["mask"])
        z_masked = m.encode_first_stage(params, masked)
        h, w = z_masked.shape[1:3]
        mask_lat = nearest_resize(mask.astype(jnp.float32), (h, w))
        c_cat = jnp.concatenate([mask_lat, z_masked], axis=-1)

        kwargs = {}
        if train and cfg_key is not None and self.model.cond_model.cfg_rate > 0:
            kwargs = dict(
                null_tokens=jnp.asarray(self.tokenizer.tokenize("")),
                cfg_key=cfg_key,
            )
        c_cross = m.cond_model.apply(
            {"params": params["cond"]},
            jnp.asarray(batch["tokens"]),
            jnp.asarray(batch["rel_pose"]),
            **kwargs,
        )
        c_input = None
        if self.refinement is not None:
            cfg = self.bundle.refinement_config
            mk = "clean_masked_image" if cfg.get("only_masked_refine") else "masked_image"
            msk = "clean_mask" if cfg.get("only_masked_refine") else "subpixel_mask"
            ref_img = jnp.asarray(batch.get(mk, batch["masked_image"]))
            ref_mask = jnp.asarray(batch.get(msk, batch["mask"]))
            c_input = self.refinement.apply({"params": params["refine"]}, ref_img, ref_mask)
        return Conditioning(c_concat=c_cat, c_crossattn=c_cross, c_input=c_input)

    def _log_fn(self, ddim_steps: int, eta: float, guidance_scale: float):
        """NVS sampling: pose-conditioned crossattn + hybrid-refine c_input
        (NVS_ldm.py log_images path)."""
        sig = ("nvs-log", ddim_steps, eta, guidance_scale)
        if sig not in self._jit_cache:

            def fn(params, image, mask, masked_image, tokens, rel_pose, uncond_tok, key):
                m = self.model
                batch = {
                    "image": image, "mask": mask, "masked_image": masked_image,
                    "tokens": tokens, "rel_pose": rel_pose,
                }
                cond = self.build_cond(params, batch)
                b, h, w, _ = cond.c_concat.shape
                shape = (b, h, w, m.unet.out_channels)
                tables = m.schedule.ddim_tables(ddim_steps, eta=eta)
                apply_fn = lambda x, t, c: m.apply_model(params, x, t, c)
                if guidance_scale > 1.0:
                    uc_cross = m.cond_model.apply({"params": params["cond"]}, uncond_tok)
                    uc = Conditioning(
                        c_concat=cond.c_concat, c_crossattn=uc_cross, c_input=cond.c_input
                    )
                    z = ddim_sample(
                        m, apply_fn, tables, cond, key, shape,
                        uncond=uc, guidance_scale=guidance_scale,
                    )
                else:
                    z = ddim_sample(m, apply_fn, tables, cond, key, shape)
                pred = m.decode_first_stage(params, z)
                return jnp.clip(pred, -1.0, 1.0)

            self._jit_cache[sig] = jax.jit(fn)
        return self._jit_cache[sig]

    def log_images(
        self,
        params: Params,
        batch: dict,
        N: Optional[int] = None,
        ddim_steps: int = 50,
        ddim_eta: float = 0.0,
        unconditional_guidance_scale: float = 9.0,
        key: Optional[jax.Array] = None,
    ) -> dict:
        n = N or batch["image"].shape[0]
        key = key if key is not None else jax.random.PRNGKey(42)
        fn = self._log_fn(ddim_steps, ddim_eta, unconditional_guidance_scale)
        pred = fn(
            params,
            jnp.asarray(batch["image"][:n]),
            jnp.asarray(batch["mask"][:n]),
            jnp.asarray(batch["masked_image"][:n]),
            jnp.asarray(batch["tokens"][:n]),
            jnp.asarray(batch["rel_pose"][:n]),
            jnp.asarray(self.uncond_tokens(n)),
            key,
        )
        return {
            "pred": pred,
            "origin_image": jnp.asarray(batch["image"][:n]),
            "masked_image": jnp.asarray(batch["masked_image"][:n]),
            "mask": jnp.asarray(batch["mask"][:n]),
        }

    def update_mask_curriculum(self, dataset, step: int):
        """Mask-rate warmup: the live dataset's complete_mask_rate ramps with
        training step (NVS_ldm.py:299-306)."""
        warmup = getattr(dataset, "warmup_mask_steps", 0)
        if warmup and step < warmup:
            dataset.complete_mask_rate = min(1.0, step / warmup)
        self.mask_steps = step


def build_task(bundle: ModelBundle):
    """Dispatch on the config's task target (the reference's class names)."""
    t = bundle.task_target
    if t == "inpainting_ldm.ref_inpainting_ldm.RefInpaintLDM":
        return RefInpaintTask(bundle)
    if t == "inpainting_ldm.multiview_ref_inpainting_ldm.RefInpaintLDM":
        return MultiViewRefInpaintTask(bundle)
    if t == "inpainting_ldm.NVS_ldm.NVSLDM":
        return NVSTask(bundle)
    raise KeyError(t)
