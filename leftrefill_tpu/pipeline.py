"""End-to-end ref-inpainting inference pipeline (the serving hot path).

Behavioural reference:
- /root/reference/ref_inpainting_gradio.py:54-138 (make_batch_sd, inpaint):
  stitch [reference | source], prompt = 50 special tokens, c_concat = [mask ↓8,
  VAE(masked_image)], CFG with uncond text only (same c_concat), DDIM eta=1.0,
  decode, composite pred*mask + origin*(1-mask), return right half.
- /root/reference/inpainting_ldm/ref_inpainting_ldm.py:38-81 (log_images /
  sample_log): latent shape taken from c_concat spatial dims.

TPU design: everything from VAE encode to the 50-step scan to decode and
composite is ONE jitted function with static shapes; host code only stitches
numpy images and tokenizes.  Compilations are cached per (batch, H, W, steps).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from leftrefill_tpu.diffusion.core import Conditioning, LeftRefillModel
from leftrefill_tpu.diffusion.ddim import ddim_sample
from leftrefill_tpu.models.tokenizer import SimpleTokenizer


@dataclasses.dataclass
class RefInpaintPipeline:
    """Reference-guided inpainting: left = reference, right = target canvas."""

    model: LeftRefillModel
    params: Any
    tokenizer: SimpleTokenizer
    special_tokens: Sequence[str]
    ddim_steps: int = 50
    guidance_scale: float = 2.5
    eta: float = 1.0
    sampler: str = "ddim"  # "ddim" | "dpm++2m" (opt-in fast path, ~20 steps)
    # latency-oriented batch/CFG parallelism (parallel/batch.py): shard the
    # CFG-doubled UNet batch over this mesh's 'data' axis; None = single-device
    mesh: Optional[Any] = None

    def __post_init__(self):
        self._prompt_tokens = np.asarray(
            self.tokenizer.tokenize(" ".join(self.special_tokens))
        )
        self._uncond_tokens = np.asarray(self.tokenizer.tokenize(""))
        self._generate = jax.jit(
            functools.partial(
                _generate,
                model=self.model,
                ddim_steps=self.ddim_steps,
                eta=self.eta,
                guidance_scale=self.guidance_scale,
                sampler=self.sampler,
                mesh=self.mesh,
            )
        )

    # ------------------------------------------------------------------
    def prompt_tokens(self, batch: int) -> np.ndarray:
        return np.repeat(self._prompt_tokens, batch, axis=0)

    def uncond_tokens(self, batch: int) -> np.ndarray:
        return np.repeat(self._uncond_tokens, batch, axis=0)

    def __call__(
        self,
        image: np.ndarray,
        mask: np.ndarray,
        key: jax.Array,
        x_T: Optional[jax.Array] = None,
        tokens: Optional[np.ndarray] = None,
    ) -> jax.Array:
        """image: [B, H, 2W, 3] in [-1, 1] (stitched canvas, NHWC);
        mask: [B, H, 2W, 1] with 1 = hole (the right half for serving).
        Returns the composited full canvas [B, H, 2W, 3] in [-1, 1]."""
        b = image.shape[0]
        tok = tokens if tokens is not None else self.prompt_tokens(b)
        return self._generate(
            self.params,
            jnp.asarray(image, jnp.float32),
            jnp.asarray(mask, jnp.float32),
            jnp.asarray(tok),
            jnp.asarray(self.uncond_tokens(b)),
            key,
            x_T,
        )

    def inpaint_right_half(self, image, mask, key, **kw) -> np.ndarray:
        """The gradio return contract: right 512x512 of the canvas
        (ref_inpainting_gradio.py:136-137)."""
        out = self(image, mask, key, **kw)
        w = out.shape[2] // 2
        return np.asarray(out[:, :, w:, :])


def _generate(
    params,
    image: jax.Array,
    mask: jax.Array,
    tokens: jax.Array,
    uncond_tokens: jax.Array,
    key: jax.Array,
    x_T: Optional[jax.Array] = None,
    *,
    model: LeftRefillModel,
    ddim_steps: int,
    eta: float,
    guidance_scale: float,
    sampler: str = "ddim",
    mesh=None,
) -> jax.Array:
    masked_image = image * (mask < 0.5)
    cond = model.build_inpaint_cond(params, tokens, mask, masked_image)
    uncond = Conditioning(
        c_concat=cond.c_concat,
        c_crossattn=model.get_learned_conditioning(params, uncond_tokens),
    )
    b, h, w, _ = cond.c_concat.shape
    shape = (b, h, w, model.unet.out_channels)

    tables = model.schedule.ddim_tables(ddim_steps, eta=eta)
    # conditioning KV cache: the text context is step-invariant, so the 16
    # cross-attn layers' k/v projections are computed ONCE per canvas here
    # instead of in every scan step (order [uncond; cond] matches the fused
    # CFG batch built by _guided_eps)
    use_cfg = guidance_scale != 1.0
    ctx_all = (
        jnp.concatenate([uncond.c_crossattn, cond.c_crossattn], axis=0)
        if use_cfg
        else cond.c_crossattn
    )
    kv = model.cross_attention_kv(params, ctx_all)
    if mesh is not None:
        from leftrefill_tpu.parallel.batch import batch_parallel_apply

        apply_fn = batch_parallel_apply(model, params, mesh, cross_kv=kv)
    else:
        # cfg_dup: cond/uncond share x_noisy and c_concat here (only the text
        # context differs), so the UNet prefix before the first cross-attn
        # runs once at half batch (models/unet.py cfg_dup — bit-exact).
        # LEFTREFILL_CFG_DUP=0 disables the shared prefix (perf A/B knob).
        dup = use_cfg and os.environ.get("LEFTREFILL_CFG_DUP", "1") != "0"
        apply_fn = lambda x, t, c: model.apply_model(
            params, x, t, c, cross_kv=kv, cfg_dup=dup
        )
    if sampler == "dpm++2m":
        from leftrefill_tpu.diffusion.samplers_extra import dpm_solver_pp_2m_sample

        z = dpm_solver_pp_2m_sample(
            model, apply_fn, tables, cond, key, shape,
            uncond=uncond, guidance_scale=guidance_scale, x_T=x_T,
            num_steps=ddim_steps,
        )
    else:
        z = ddim_sample(
            model,
            apply_fn,
            tables,
            cond,
            key,
            shape,
            uncond=uncond,
            guidance_scale=guidance_scale,
            x_T=x_T,
        )
    pred = model.decode_first_stage(params, z)
    pred = jnp.clip(pred, -1.0, 1.0)
    # composite prediction into the hole only (test_inpainting.py:147)
    return pred * mask + image * (1.0 - mask)


def stitch_canvas(
    reference: np.ndarray, source: np.ndarray, mask_right: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """[reference | source] horizontal stitch with a zero-left mask
    (ref_inpainting_gradio.py:184-188).  All inputs NHWC float, images in
    [-1,1], mask_right [B,H,W,1] in {0,1}."""
    image = np.concatenate([reference, source], axis=2)
    mask = np.concatenate([np.zeros_like(mask_right), mask_right], axis=2)
    return image, mask
