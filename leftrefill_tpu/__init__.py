"""LeftRefill-TPU: a TPU-native (JAX/XLA/Pallas) reference-guided image synthesis
framework with the capabilities of ewrfcas/LeftRefill (CVPR 2024).

The framework re-implements, TPU-first, the full LeftRefill stack:

- frozen Stable-Diffusion-2-inpainting UNet / VAE / OpenCLIP ViT-H text tower
  (Flax modules, NHWC layout, bf16 compute with fp32 GroupNorm/softmax islands),
- learnable prompt-token conditioning (``PromptCLIPEmbedder`` semantics,
  reference: ldm/modules/encoders/Refill_modules.py),
- DDIM sampling as a fused ``lax.scan`` with batched classifier-free guidance
  (reference: ldm/models/diffusion/ddim.py),
- multi-view rearranged self-attention and multi-canvas consistent sampling
  (reference: ldm/modules/multiview_attention.py, ddim.py:146-222),
- novel-view synthesis with relative-pose conditioning, LoRA, refinement branch
  (reference: inpainting_ldm/NVS_ldm.py),
- prompt-tuning training with data-parallel pjit over a TPU mesh
  (reference: train_inpainting.py + PyTorch-Lightning DDP),
- Pallas flash-attention kernels for the stitched-canvas attention hot path.

Nothing in this package is a translation of the reference's PyTorch code; the
reference defines behaviour (cited per-module as ``file:line``), the
implementation is JAX-native.
"""

__version__ = "0.1.0"

# The public API surface (lazy to keep bare `import leftrefill_tpu` light).
__all__ = [
    "build_model_from_config",
    "build_task",
    "RefInpaintPipeline",
]


def __getattr__(name):
    if name == "build_model_from_config":
        from leftrefill_tpu.config import build_model_from_config

        return build_model_from_config
    if name == "build_task":
        from leftrefill_tpu.tasks import build_task

        return build_task
    if name == "RefInpaintPipeline":
        from leftrefill_tpu.pipeline import RefInpaintPipeline

        return RefInpaintPipeline
    raise AttributeError(name)
