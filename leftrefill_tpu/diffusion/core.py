"""Latent diffusion core: model bundle, conditioning assembly, q_sample,
parameterizations, and the training loss.

Behavioural reference: /root/reference/ldm/models/diffusion/ddpm.py —
- get_first_stage_encoding (x0.18215 scale): :668-675
- apply_model / DiffusionWrapper conditioning modes: :865-880, :1327-1371
- q_sample / get_v: :367-376
- p_losses (latent): :900-935
- LatentInpaintDiffusion.get_input (mask ↓8 + VAE(masked_image) -> 5-channel
  c_concat): :1671-1694

Everything is functional: a frozen ``LeftRefillModel`` bundle holds module
*definitions* and static config; parameters travel separately in one pytree
``{"unet":…, "vae":…, "cond":…}`` so jit/pjit and optax masking stay trivial.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from leftrefill_tpu.diffusion.schedules import DiffusionSchedule
from leftrefill_tpu.models.autoencoder import AutoencoderKL, DiagonalGaussian
from leftrefill_tpu.models.clip import PromptCLIPEmbedder
from leftrefill_tpu.models.unet import UNetModel

Params = Any


def _bcast(table: jnp.ndarray, t: jax.Array, ndim: int) -> jax.Array:
    """extract_into_tensor (diffusionmodules/util.py:96-99): gather per-batch
    schedule entries and broadcast over trailing dims."""
    out = jnp.asarray(table)[t]
    return out.reshape(t.shape[0], *([1] * (ndim - 1)))


@dataclasses.dataclass(frozen=True)
class Conditioning:
    """The 'hybrid' conditioning bundle (DiffusionWrapper, ddpm.py:1348-1351).

    c_concat: [B, h, w, 5] (mask ↓8 ⊕ VAE(masked_image)); channel-concatenated
    to the latent.  c_crossattn: [B, L, C] text context.  c_input: optional
    NVS refinement residual (hybrid-refine, ddpm.py:1352-1355).
    """

    c_concat: Optional[jax.Array] = None
    c_crossattn: Optional[jax.Array] = None
    c_input: Optional[jax.Array] = None

    def concat_batch(self, other: "Conditioning") -> "Conditioning":
        """Stack [other; self] along batch — the CFG doubling layout
        (uncond first, ddim.py:317-343)."""

        def cat(a, b):
            if a is None and b is None:
                return None
            return jnp.concatenate([a, b], axis=0)

        return Conditioning(
            c_concat=cat(other.c_concat, self.c_concat),
            c_crossattn=cat(other.c_crossattn, self.c_crossattn),
            c_input=cat(other.c_input, self.c_input),
        )


jax.tree_util.register_pytree_node(
    Conditioning,
    lambda c: ((c.c_concat, c.c_crossattn, c.c_input), None),
    lambda _, ch: Conditioning(*ch),
)


@dataclasses.dataclass(frozen=True)
class LeftRefillModel:
    """Module definitions + static config for one task model.  Parameters are
    provided per-call as ``{"unet":…, "vae":…, "cond":…}``."""

    unet: UNetModel
    vae: AutoencoderKL
    cond_model: PromptCLIPEmbedder
    schedule: DiffusionSchedule
    scale_factor: float = 0.18215
    conditioning_key: str = "hybrid"
    parameterization: str = "eps"

    # ---------- first stage ------------------------------------------------

    def encode_first_stage(self, params: Params, x: jax.Array, key=None) -> jax.Array:
        """image [-1,1] NHWC -> scaled latent.  Deterministic by default (the
        reference hard-seeds the VAE sample, distributions.py:36-38)."""
        moments = self.vae.apply({"params": params["vae"]}, x, method=self.vae.encode_moments)
        z = DiagonalGaussian(moments).sample(key)
        return self.scale_factor * z

    def decode_first_stage(self, params: Params, z: jax.Array) -> jax.Array:
        return self.vae.apply({"params": params["vae"]}, z / self.scale_factor, method=self.vae.decode)

    # ---------- conditioning ----------------------------------------------

    def get_learned_conditioning(self, params: Params, tokens: jax.Array) -> jax.Array:
        return self.cond_model.apply({"params": params["cond"]}, tokens)

    def build_inpaint_cond(
        self,
        params: Params,
        tokens: jax.Array,
        mask: jax.Array,
        masked_image: jax.Array,
    ) -> Conditioning:
        """LatentInpaintDiffusion.get_input concat path (ddpm.py:1671-1694):
        c_concat = [mask ↓ to latent size (nearest), VAE(masked_image)]."""
        from leftrefill_tpu.ops.layers import nearest_resize

        z_masked = self.encode_first_stage(params, masked_image)
        h, w = z_masked.shape[1:3]
        mask_lat = nearest_resize(mask.astype(jnp.float32), (h, w))
        c_cat = jnp.concatenate([mask_lat, z_masked], axis=-1)
        c_cross = self.get_learned_conditioning(params, tokens)
        return Conditioning(c_concat=c_cat, c_crossattn=c_cross)

    def cross_attention_kv(self, params: Params, context: jax.Array):
        """Conditioning KV cache: precompute every cross-attention layer's
        (k, v) for a fixed context (the text conditioning is step-invariant
        through a sampling scan, and XLA does not hoist the projections out
        of the while loop — scripts/tpu_r3_licm_check.py).  Pass the result
        to apply_model as ``cross_kv=``.  Returns None for pure-concat
        conditioning (no cross-attention context)."""
        if self.conditioning_key == "concat":
            return None
        return self.unet.apply({"params": params["unet"]}, context, method="cross_kv")

    # ---------- model application -----------------------------------------

    def apply_model(
        self, params: Params, x_noisy: jax.Array, t: jax.Array, cond: Conditioning, **kwargs
    ) -> jax.Array:
        """DiffusionWrapper.forward (ddpm.py:1337-1371) for the modes
        LeftRefill uses: concat / crossattn / hybrid / hybrid-refine."""
        key = self.conditioning_key
        if key == "concat":
            xc = jnp.concatenate([x_noisy, cond.c_concat], axis=-1)
            return self.unet.apply({"params": params["unet"]}, xc, t, None, **kwargs)
        if key == "crossattn":
            return self.unet.apply(
                {"params": params["unet"]}, x_noisy, t, cond.c_crossattn, **kwargs
            )
        if key == "hybrid":
            xc = jnp.concatenate([x_noisy, cond.c_concat], axis=-1)
            return self.unet.apply(
                {"params": params["unet"]}, xc, t, cond.c_crossattn, **kwargs
            )
        if key == "hybrid-refine":
            xc = jnp.concatenate([x_noisy, cond.c_concat], axis=-1)
            return self.unet.apply(
                {"params": params["unet"]},
                xc,
                t,
                cond.c_crossattn,
                c_input=cond.c_input,
                **kwargs,
            )
        raise NotImplementedError(key)

    # ---------- forward process / parameterizations ------------------------

    def q_sample(self, x_start: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        s = self.schedule
        return (
            _bcast(s.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + _bcast(s.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    def get_v(self, x: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        s = self.schedule
        return (
            _bcast(s.sqrt_alphas_cumprod, t, x.ndim) * noise
            - _bcast(s.sqrt_one_minus_alphas_cumprod, t, x.ndim) * x
        )

    def predict_eps_from_z_and_v(self, x: jax.Array, t: jax.Array, v: jax.Array) -> jax.Array:
        s = self.schedule
        return (
            _bcast(s.sqrt_alphas_cumprod, t, x.ndim) * v
            + _bcast(s.sqrt_one_minus_alphas_cumprod, t, x.ndim) * x
        )

    def predict_start_from_z_and_v(self, x: jax.Array, t: jax.Array, v: jax.Array) -> jax.Array:
        s = self.schedule
        return (
            _bcast(s.sqrt_alphas_cumprod, t, x.ndim) * x
            - _bcast(s.sqrt_one_minus_alphas_cumprod, t, x.ndim) * v
        )

    # ---------- training loss ----------------------------------------------

    def p_losses(
        self,
        params: Params,
        z: jax.Array,
        cond: Conditioning,
        t: jax.Array,
        noise: jax.Array,
        loss_type: str = "l2",
        l_simple_weight: float = 1.0,
        original_elbo_weight: float = 0.0,
        per_element: bool = False,
    ):
        """Latent p_losses (ddpm.py:900-935) with logvar == 0 (LeftRefill never
        enables learn_logvar): loss = l_simple_weight * mean(loss_simple)
        + original_elbo_weight * lvlb term.

        ``per_element=True`` returns the unreduced [B,H,W,C] error map — the
        multi-view task reduces over a view-0 slice only
        (multiview_ref_inpainting_ldm.py:38-91).
        """
        x_noisy = self.q_sample(z, t, noise)
        model_output = self.apply_model(params, x_noisy, t, cond)

        if self.parameterization == "x0":
            target = z
        elif self.parameterization == "eps":
            target = noise
        elif self.parameterization == "v":
            target = self.get_v(z, noise, t)
        else:
            raise NotImplementedError(self.parameterization)

        if loss_type == "l1":
            err = jnp.abs(model_output.astype(jnp.float32) - target)
        elif loss_type == "l2":
            err = (model_output.astype(jnp.float32) - target) ** 2
        else:
            raise NotImplementedError(loss_type)

        if per_element:
            return err

        loss_simple = err.mean(axis=(1, 2, 3))
        loss_vlb = (jnp.asarray(self.schedule.lvlb_weights)[t] * loss_simple).mean()
        loss = l_simple_weight * loss_simple.mean() + original_elbo_weight * loss_vlb
        metrics = {
            "loss_simple": loss_simple.mean(),
            "loss_vlb": loss_vlb,
            "loss": loss,
        }
        return loss, metrics
