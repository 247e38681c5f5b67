"""Round-3, VERDICT item 2/6: synthetic quality bound for the int8 path and
the GroupNorm32 fast_affine deviation.

Measures, on the full-size 865M UNet with realistically-initialized random
weights (lecun init, zero convs unzeroed — no SD2 ckpt exists in this env):

  1. eps-output deviation of bf16 (fast_affine on/off) and int8-W8A8
     (per-row dense scales) forwards vs an fp32 reference forward, over a
     sweep of timesteps;
  2. end-to-end DDIM-50 cfg2.5 pipeline A/B: bf16 vs int8 canvases from the
     same seed (PSNR between the two outputs).

Caveat: random weights don't reproduce trained-weight activation outliers;
this bounds kernel/quantization noise, not model quality (which needs the
real ckpt, runbook item 4).
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

print("backend:", jax.devices()[0].platform, flush=True)

from leftrefill_tpu.models.unet import UNetModel
from leftrefill_tpu.ops.quant import quantize_params_like
from tests.test_tasks import unzero_kernels

B = 2
x = jax.random.normal(jax.random.PRNGKey(0), (B, 64, 128, 9), jnp.float32)
ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 77, 1024), jnp.float32) * 0.5

m32 = UNetModel(dtype=jnp.float32)
# build realistically-scaled params host-side from the shape tree (jitting the
# full fp32 init on the chip compiles pathologically slowly through the relay)
shapes = jax.eval_shape(
    m32.init, jax.random.PRNGKey(2), x, jnp.zeros((B,), jnp.int32), ctx
)["params"]
rng = np.random.RandomState(0)


def mk(path, s):
    name = getattr(path[-1], "key", str(path[-1]))
    if len(s.shape) >= 2:
        fan_in = int(np.prod(s.shape[:-1]))
        arr = rng.randn(*s.shape).astype(np.float32) / np.sqrt(max(fan_in, 1))
        return jnp.asarray(arr, s.dtype)
    # 1-D: norm scales must be ~1, biases small noise (not all-zero)
    if name == "scale":
        return jnp.ones(s.shape, s.dtype)
    return jnp.asarray(rng.randn(*s.shape).astype(np.float32) * 0.02, s.dtype)


params = jax.tree_util.tree_map_with_path(mk, shapes)
print("params ready", flush=True)

q_model = UNetModel(dtype=jnp.bfloat16, quant=True)
q_struct = jax.eval_shape(
    q_model.init, jax.random.PRNGKey(2), x, jnp.zeros((B,), jnp.int32), ctx
)["params"]
qparams = quantize_params_like(q_struct, params)

import leftrefill_tpu.ops.layers as layers_mod
from leftrefill_tpu.ops.layers import GroupNorm32

variants = {
    "bf16_fast_affine": (UNetModel(dtype=jnp.bfloat16), params, True),
    "bf16_fp32_affine": (UNetModel(dtype=jnp.bfloat16), params, False),
    "int8_rowwise": (q_model, qparams, True),
}

apply32 = jax.jit(lambda p, x, t, c: m32.apply({"params": p}, x, t, c))

# jit one fn per variant (fast_affine default is read at TRACE time from the
# module global, so each variant's first call bakes its setting in)
fns = {}
for name, (model, p, fast) in variants.items():
    layers_mod._FAST_AFFINE_DEFAULT = fast
    fn = jax.jit(lambda p, x, t, c, m=model: m.apply({"params": p}, x, t, c))
    fn(p, x, jnp.zeros((B,), jnp.int32), ctx).block_until_ready()
    fns[name] = fn
    print(f"compiled {name}", flush=True)
layers_mod._FAST_AFFINE_DEFAULT = True

for t_val in (1, 250, 500, 750, 999):
    tt = jnp.full((B,), t_val, jnp.int32)
    ref = np.asarray(apply32(params, x, tt, ctx), np.float32)
    rms = float(np.sqrt((ref**2).mean()))
    line = {"t": t_val, "ref_rms": round(rms, 5)}
    for name, (model, p, fast) in variants.items():
        out = np.asarray(fns[name](p, x, tt, ctx), np.float32)
        d = np.abs(out - ref)
        line[name] = {
            "max_rel": round(float(d.max() / rms), 5),
            "mean_rel": round(float(d.mean() / rms), 6),
        }
    print(json.dumps(line), flush=True)

# ---------------------------------------------------------------------------
# end-to-end pipeline A/B (bf16 vs int8, same seed)
print("pipeline A/B...", flush=True)
sys.path.insert(0, "/root/repo")
import bench
from leftrefill_tpu.models.clip import build_prompt_tokenizer
from leftrefill_tpu.pipeline import RefInpaintPipeline, stitch_canvas
import warnings

outs = {}
for quant in (False, True):
    model, pp = bench.build_full_bundle(quant=quant)
    pp = dict(pp)
    pp["unet"] = (
        quantize_params_like(
            jax.eval_shape(
                model.unet.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 9)),
                jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 1024)),
            )["params"],
            unzero_kernels(bench.build_full_bundle(quant=False)[1]["unet"]),
        )
        if quant
        else unzero_kernels(pp["unet"])
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tok, sp, _ = build_prompt_tokenizer(["repeat_50_<special-token>"], ["init"])
    pipe = RefInpaintPipeline(
        model=model, params=pp, tokenizer=tok, special_tokens=sp,
        ddim_steps=50, guidance_scale=2.5, eta=1.0,
    )
    rng = np.random.RandomState(0)
    ref_img = rng.uniform(-1, 1, (1, 512, 512, 3)).astype(np.float32)
    src = rng.uniform(-1, 1, (1, 512, 512, 3)).astype(np.float32)
    image, mask = stitch_canvas(ref_img, src, np.ones((1, 512, 512, 1), np.float32))
    outs["int8" if quant else "bf16"] = np.asarray(
        pipe(image, mask, jax.random.PRNGKey(7)), np.float32
    )
    print(f"pipeline {'int8' if quant else 'bf16'} done", flush=True)

a, b = outs["bf16"], outs["int8"]
mse = float(((a - b) ** 2).mean())
psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
print(json.dumps({
    "pipeline_ab": {
        "mse": round(mse, 8),
        "psnr_bf16_vs_int8_db": round(psnr, 2),
        "maxdiff": round(float(np.abs(a - b).max()), 5),
    }
}), flush=True)
print("QUALITY DONE", flush=True)
