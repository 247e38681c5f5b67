"""Round-3: end-to-end DDIM-50 cfg2.5 pipeline A/B — bf16 vs int8 canvases
from the same seed/weights (PSNR between the two outputs).  Lean on HBM: one
fp32 param set shared by both pipelines; the int8 UNet tree derives from it.
"""
import sys, json, warnings
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

print("backend:", jax.devices()[0].platform, flush=True)

import bench
from leftrefill_tpu.ops.quant import quantize_params_like
from leftrefill_tpu.models.clip import build_prompt_tokenizer
from leftrefill_tpu.pipeline import RefInpaintPipeline, stitch_canvas
from tests.test_tasks import unzero_kernels

model_fp, params = bench.build_full_bundle(quant=False)
params = dict(params)
params["unet"] = unzero_kernels(params["unet"])
# build the int8 model WITHOUT re-initializing params
q_unet = model_fp.unet.clone(quant=True)
q_struct = jax.eval_shape(
    q_unet.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 9)),
    jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 1024)),
)["params"]
qparams = dict(params)
qparams["unet"] = quantize_params_like(q_struct, params["unet"])
import dataclasses

model_q = dataclasses.replace(model_fp, unet=q_unet)
# third variant: int8 UNet + int8 VAE decoder (BENCH_QUANT_VAE path)
q_vae = model_fp.vae.clone(quant_decoder=True)
v_struct = jax.eval_shape(q_vae.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)))["params"]
vparams = dict(qparams)
vparams["vae"] = quantize_params_like(v_struct, params["vae"])
model_qv = dataclasses.replace(model_q, vae=q_vae)
print("params ready", flush=True)

with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    tok, sp, _ = build_prompt_tokenizer(["repeat_50_<special-token>"], ["init"])

rng = np.random.RandomState(0)
ref = rng.uniform(-1, 1, (1, 512, 512, 3)).astype(np.float32)
src = rng.uniform(-1, 1, (1, 512, 512, 3)).astype(np.float32)
image, mask = stitch_canvas(ref, src, np.ones((1, 512, 512, 1), np.float32))

outs = {}
for name, mdl, pp in (
    ("bf16", model_fp, params),
    ("int8", model_q, qparams),
    ("int8+vae8", model_qv, vparams),
):
    pipe = RefInpaintPipeline(
        model=mdl, params=pp, tokenizer=tok, special_tokens=sp,
        ddim_steps=50, guidance_scale=2.5, eta=1.0,
    )
    outs[name] = np.asarray(pipe(image, mask, jax.random.PRNGKey(7)), np.float32)
    print(f"pipeline {name} done", flush=True)

def _psnr(a, b):
    mse = float(((a - b) ** 2).mean())
    return 10 * np.log10(4.0 / max(mse, 1e-12))


res = {}
for pair in (("bf16", "int8"), ("bf16", "int8+vae8"), ("int8", "int8+vae8")):
    a, b = outs[pair[0]], outs[pair[1]]
    res[f"psnr_{pair[0]}_vs_{pair[1]}_db"] = round(_psnr(a, b), 2)
    res[f"psnr_right_{pair[0]}_vs_{pair[1]}_db"] = round(
        _psnr(a[:, :, 512:], b[:, :, 512:]), 2
    )
    res[f"maxdiff_{pair[0]}_vs_{pair[1]}"] = round(float(np.abs(a - b).max()), 5)
print(json.dumps({"pipeline_ab": res}), flush=True)
print("PIPELINE AB DONE", flush=True)
