"""Evaluation metrics replicating the reference protocol.

Behavioural reference: /root/reference/test_inpainting.py:147-166 —
- PSNR on (pred+1)/2 vs (gt+1)/2, data_range=1 (torchmetrics)
- SSIM on grayscale (torchvision rgb_to_grayscale: 0.299/0.587/0.114) via
  skimage.structural_similarity defaults: 7x7 uniform filter, K1=0.01,
  K2=0.03.  NOTE the reference passes no data_range on float images, so
  skimage uses its float dtype_range of 2.0 — replicated here as the default
  (a protocol quirk that must be matched for comparable numbers).
- LPIPS(alex) on [-1,1] inputs (eval/lpips.py)

All metrics are pure jnp; batch-shaped inputs are NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

GRAY_WEIGHTS = jnp.array([0.299, 0.587, 0.114])


def psnr(pred01: jax.Array, target01: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Per-batch PSNR over all non-batch dims; inputs in [0,1]."""
    mse = jnp.mean((pred01 - target01) ** 2, axis=tuple(range(1, pred01.ndim)))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def rgb_to_grayscale(x: jax.Array) -> jax.Array:
    """[...,3] -> [...,1], ITU-R 601-2 luma (torchvision semantics)."""
    return jnp.sum(x * GRAY_WEIGHTS, axis=-1, keepdims=True)


def _uniform_filter_valid(x: jax.Array, win: int) -> jax.Array:
    """Mean filter with 'valid' cropping on [B,H,W] maps."""
    kernel = jnp.ones((win, win), x.dtype) / (win * win)
    return jax.lax.conv_general_dilated(
        x[:, None],
        kernel[None, None],
        window_strides=(1, 1),
        padding="VALID",
    )[:, 0]


def ssim(
    pred: jax.Array,
    target: jax.Array,
    data_range: float = 2.0,
    win_size: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """skimage.structural_similarity (gaussian_weights=False) on [B,H,W]
    grayscale maps.  Default data_range=2.0 matches the reference's
    no-data_range call on float images (see module docstring)."""
    pred = pred.astype(jnp.float64) if pred.dtype == jnp.float64 else pred.astype(jnp.float32)
    target = target.astype(pred.dtype)
    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1)

    ux = _uniform_filter_valid(pred, win_size)
    uy = _uniform_filter_valid(target, win_size)
    uxx = _uniform_filter_valid(pred * pred, win_size)
    uyy = _uniform_filter_valid(target * target, win_size)
    uxy = _uniform_filter_valid(pred * target, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    a1 = 2 * ux * uy + c1
    a2 = 2 * vxy + c2
    b1 = ux**2 + uy**2 + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    return jnp.mean(s, axis=(1, 2))


def composite_metrics(
    pred: jax.Array, origin: jax.Array, mask: jax.Array
) -> dict[str, jax.Array]:
    """The full metric protocol on the composited right half
    (test_inpainting.py:141-166): composite pred into the hole, crop the right
    half, PSNR on [0,1], SSIM on grayscale.  pred/origin [-1,1] NHWC,
    mask NHWC (1=hole)."""
    comp = pred * mask + origin * (1 - mask)
    h, w = comp.shape[1:3]
    if w != h:
        comp = comp[:, :, w // 2 :]
        origin = origin[:, :, w // 2 :]
    p01 = (comp + 1) / 2
    o01 = (origin + 1) / 2
    return {
        "psnr": psnr(p01, o01),
        "ssim": ssim(rgb_to_grayscale(p01)[..., 0], rgb_to_grayscale(o01)[..., 0]),
        "composite": comp,
    }
