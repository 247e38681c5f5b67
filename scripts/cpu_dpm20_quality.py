"""Round-4, VERDICT item 1 (quality half): synthetic solver-accuracy bound
for the 20-step DPM-Solver++(2M) fast path vs the 50-step DDIM default.

All three samplers below integrate the SAME probability-flow ODE (eta=0,
same weights, same x_T), so a fine-grained DDIM-200 run is a quasi-exact
gold trajectory and the PSNR of each fast sampler against it measures pure
solver error — on CPU with the tiny structurally-complete bundle
(tests/test_pipeline.py), since solver error is a property of the sampler
coefficients + model smoothness, not of model scale.

Expected: PSNR(dpm20, gold) >= PSNR(ddim50, gold) — the solver's whole
point (reference: the vendored dpm_solver/dpm_solver.py multistep order-2;
trajectory parity already pinned in tests/test_sampler_golden.py).

Run: python scripts/cpu_dpm20_quality.py   (CPU, ~1 min)
"""
import sys, json
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import functools
import numpy as np
import jax.numpy as jnp

from tests.test_pipeline import build_tiny_bundle
from tests.test_tasks import unzero_kernels
from leftrefill_tpu.models.clip import build_prompt_tokenizer
from leftrefill_tpu.pipeline import RefInpaintPipeline, stitch_canvas, _generate

model, params = build_tiny_bundle()
params = dict(params)
params["unet"] = unzero_kernels(params["unet"])  # zero out-convs => zero eps
tok, sp, _ = build_prompt_tokenizer([f"<special-token{i}>" for i in range(4)], None)

rng = np.random.RandomState(0)
ref = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
src = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
image, mask = stitch_canvas(ref, src, np.ones((1, 32, 32, 1), np.float32))

pipe = RefInpaintPipeline(
    model=model, params=params, tokenizer=tok, special_tokens=sp,
    ddim_steps=50, guidance_scale=2.5, eta=0.0,
)
tokens = jnp.asarray(pipe.prompt_tokens(1))
utokens = jnp.asarray(pipe.uncond_tokens(1))
img = jnp.asarray(image, jnp.float32)
msk = jnp.asarray(mask, jnp.float32)
x_T = jax.random.normal(jax.random.PRNGKey(7), (1, 16, 32, 4), jnp.float32)

runs = {
    "gold_ddim200": ("ddim", 200),
    "ddim50": ("ddim", 50),
    "dpm20": ("dpm++2m", 20),
    "dpm15": ("dpm++2m", 15),
    "dpm12": ("dpm++2m", 12),
    "dpm10": ("dpm++2m", 10),
}
outs = {}
for name, (sampler, steps) in runs.items():
    gen = jax.jit(
        functools.partial(
            _generate, model=model, ddim_steps=steps, eta=0.0,
            guidance_scale=2.5, sampler=sampler,
        )
    )
    outs[name] = np.asarray(
        gen(params, img, msk, tokens, utokens, jax.random.PRNGKey(0), x_T),
        np.float32,
    )
    print(f"{name} done", flush=True)

gold = outs["gold_ddim200"]
report = {}
for name in ("ddim50", "dpm20", "dpm15", "dpm12", "dpm10"):
    # right (inpainted) half only: the left half is a composite passthrough
    d = (outs[name] - gold)[:, :, 32:]
    mse = float((d**2).mean())
    report[name] = {
        "psnr_vs_gold_db": round(10 * np.log10(4.0 / max(mse, 1e-12)), 2),
        "maxdiff": round(float(np.abs(d).max()), 5),
    }
d = (outs["dpm20"] - outs["ddim50"])[:, :, 32:]
mse = float((d**2).mean())
report["dpm20_vs_ddim50"] = {
    "psnr_db": round(10 * np.log10(4.0 / max(mse, 1e-12)), 2)
}
print(json.dumps(report), flush=True)
print("DPM20 QUALITY DONE", flush=True)
