"""Synthetic quality bound for the int8 VAE decoder (BENCH_QUANT_VAE path),
computed ON CPU with exact W8A8 numerics.

Why this is valid off-TPU: with LEFTREFILL_INT8_XLA_CONV=1 the quant conv
dispatch (models/unet.conv3x3_forward) runs ops/quant.conv_int8_xla — real
int8 weights, real dynamically-quantized int8 activations (the same
per-tensor scales as the Pallas kernel), int32 accumulation — so the CPU
result differs from the TPU kernel only by accumulation order.  Without the
gate, the CPU fallback dequantizes weights and skips activation quantization,
which would UNDERSTATE the error.

Protocol mirrors scripts/tpu_r3_pipeline_ab.py's decoder leg: decode the same
latent through (a) the bf16 decoder and (b) the int8 decoder, PSNR over the
[-1, 1] output range (peak^2 = 4).  Adds an fp32-vs-bf16 PSNR so the int8
delta can be read against the bf16 rounding floor.

Run (CPU is forced in-process; safe next to a TPU job):
    LEFTREFILL_INT8_XLA_CONV=1 python scripts/cpu_vae8_quality.py
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("LEFTREFILL_INT8_XLA_CONV", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

from leftrefill_tpu.models.autoencoder import AutoencoderKL, DDConfig
from leftrefill_tpu.ops.quant import int8_xla_conv_enabled, quantize_params_like

assert int8_xla_conv_enabled(), "set LEFTREFILL_INT8_XLA_CONV=1 (exact W8A8 on CPU)"

# protocol-size canvas latent (64x128 -> 512x1024) unless overridden
H = int(os.environ.get("VAE8_H", "64"))
W = int(os.environ.get("VAE8_W", "128"))

vae = AutoencoderKL(ddconfig=DDConfig(), embed_dim=4, dtype=jnp.bfloat16)
params = jax.jit(vae.init)(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]

q_vae = vae.clone(quant_decoder=True)
v_struct = jax.eval_shape(q_vae.init, jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))[
    "params"
]
qparams = quantize_params_like(v_struct, params)

vae_fp32 = vae.clone(dtype=jnp.float32)

# a latent with the diffusion path's statistics: unit-normal scaled by the
# SD scale factor's inverse (decode receives z/scale ~ N(0, (1/0.18215)^2))
z = jax.random.normal(jax.random.PRNGKey(7), (1, H, W, 4), jnp.float32) / 0.18215

def _decode(mdl, p):
    fn = jax.jit(lambda pp, zz: mdl.apply({"params": pp}, zz, method="decode"))
    return np.asarray(fn(p, z), np.float32)


dec_bf16 = _decode(vae, params)
dec_int8 = _decode(q_vae, qparams)
dec_fp32 = _decode(vae_fp32, params)


def psnr(a, b):
    mse = float(((a - b) ** 2).mean())
    return round(10 * np.log10(4.0 / max(mse, 1e-12)), 2)


out = {
    "shape": list(dec_bf16.shape),
    "psnr_fp32_vs_bf16_db": psnr(dec_fp32, dec_bf16),
    "psnr_bf16_vs_int8_db": psnr(dec_bf16, dec_int8),
    "psnr_fp32_vs_int8_db": psnr(dec_fp32, dec_int8),
    "maxdiff_bf16_vs_int8": round(float(np.abs(dec_bf16 - dec_int8).max()), 5),
    "out_rms": round(float(np.sqrt((dec_fp32**2).mean())), 4),
}
print(json.dumps({"vae8_quality_cpu": out}), flush=True)
print("VAE8 QUALITY DONE", flush=True)
