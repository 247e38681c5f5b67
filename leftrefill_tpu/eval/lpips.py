"""LPIPS (AlexNet flavor) in JAX/Flax.

Behavioural reference: the ``lpips.LPIPS(net='alex')`` metric used by
/root/reference/train_inpainting.py:79 and test_inpainting.py:158 (the
richzhang/PerceptualSimilarity architecture, reimplemented from its published
definition):

  input [-1,1] -> fixed ScalingLayer -> AlexNet conv features (5 taps after
  each ReLU) -> channel-unit-normalize -> squared diff -> 1x1 'lin' conv
  (non-negative weights, no bias) -> spatial mean -> sum over the 5 taps.

Weights: the converter maps the standard lpips checkpoint (``alexnet``
backbone conv weights + ``lin0..lin4.model.1.weight``).  Without a weights
file (zero-egress build env) the module still runs with random weights —
fine for smoke tests, NOT a calibrated metric; pass ``weights_path`` for real
LPIPS numbers.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# fixed input normalization constants of the published LPIPS ScalingLayer
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# AlexNet feature tower: (out_ch, kernel, stride, padding), maxpool flags
_ALEX = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_AFTER = {0, 1}  # maxpool 3x3/2 after taps 0 and 1
_CHANNELS = [64, 192, 384, 256, 256]


class AlexFeatures(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        feats = []
        for i, (ch, k, s, p) in enumerate(_ALEX):
            x = nn.Conv(
                ch,
                kernel_size=(k, k),
                strides=(s, s),
                padding=((p, p), (p, p)),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"conv{i}",
            )(x)
            x = nn.relu(x)
            feats.append(x)
            if i in _POOL_AFTER:
                x = nn.max_pool(x, window_shape=(3, 3), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """__call__(x, y): [-1,1] NHWC images -> per-batch LPIPS distance."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        net = AlexFeatures(dtype=self.dtype, name="net")
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(jnp.sum(a**2, axis=-1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b**2, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            lin = nn.Conv(
                1,
                kernel_size=(1, 1),
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"lin{i}",
            )(d)
            total = total + jnp.mean(lin, axis=(1, 2, 3))
        return total


def load_lpips_weights(weights_path: str, alexnet_path: str | None = None) -> dict:
    """Convert the standard lpips checkpoint(s) to the flax param tree.
    ``weights_path``: the lin-layer ckpt (lpips/weights/v0.1/alex.pth);
    ``alexnet_path``: torchvision alexnet state_dict (features.N.weight)."""
    from leftrefill_tpu.convert.torch_to_flax import load_torch_state_dict

    params: dict = {"net": {}}
    if alexnet_path is None:
        # no backbone weights: fall back to seeded random conv features so the
        # module still applies (smoke/dry-run mode — NOT a calibrated metric)
        import jax

        init = AlexFeatures().init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
        )["params"]
        params["net"] = dict(init)
    lin_sd = load_torch_state_dict(weights_path)
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        if key not in lin_sd:
            key = f"lin{i}.weight"
        w = lin_sd[key]  # [1, C, 1, 1]
        params[f"lin{i}"] = {"kernel": w.transpose(2, 3, 1, 0)}
    if alexnet_path:
        alex_sd = load_torch_state_dict(alexnet_path)
        conv_ids = [0, 3, 6, 8, 10]  # torchvision alexnet.features indices
        for i, fi in enumerate(conv_ids):
            params["net"][f"conv{i}"] = {
                "kernel": alex_sd[f"features.{fi}.weight"].transpose(2, 3, 1, 0),
                "bias": alex_sd[f"features.{fi}.bias"],
            }
    return params
