"""Benchmark: stitched 512x1024 ref-inpainting canvases/sec on one TPU chip
(BASELINE.md north-star metric; task protocol from
/root/reference/README.md:106-113 — cfg 2.5, batch 1).

Default config since r4: W8A8 int8 UNet + DPM-Solver++(2M) at 15 steps.
The 15-step solver is MORE accurate than the reference's 50-step DDIM
protocol per the measured solver-truncation bound (right-half PSNR vs a
DDIM-200 gold ODE trajectory, scripts/cpu_dpm20_quality.py: dpm15 64.9 dB
vs ddim50 63.0 dB), so the headline number is not a quality trade.  The
reference protocol is still reachable: BENCH_SAMPLER=ddim BENCH_STEPS=50
(r4 epoch: 0.7259 canvases/s int8 at shipped defaults, 0.4683 bf16).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to the BASELINE.json north-star target of 2.0
canvases/sec/chip (the reference publishes no hardware numbers).

Weights are random (the SD2 checkpoint is not present in this environment);
throughput depends only on the compute graph, which matches the real one.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import jax
import jax.numpy as jnp
import numpy as np

# Persistent XLA compile cache: a re-run of the SAME configuration (e.g. the
# stage-3 per-flag A/B's repeated all-on baseline) skips the multi-minute
# UNet compile.  Timing below always excludes compile (warmup before the
# clock), so this changes wall-clock only, never the recorded number.
from leftrefill_tpu.runtime import enable_persistent_compilation_cache

enable_persistent_compilation_cache()


def build_full_bundle(dtype=jnp.bfloat16, quant=False, quant_vae=False):
    from leftrefill_tpu.diffusion.core import LeftRefillModel
    from leftrefill_tpu.diffusion.schedules import DiffusionSchedule
    from leftrefill_tpu.models.autoencoder import AutoencoderKL, DDConfig
    from leftrefill_tpu.models.clip import PromptCLIPEmbedder
    from leftrefill_tpu.models.unet import UNetModel

    unet = UNetModel(dtype=dtype, quant=quant)  # SD2-inpainting defaults (865M)
    vae = AutoencoderKL(
        ddconfig=DDConfig(), embed_dim=4, dtype=dtype, quant_decoder=quant_vae
    )
    clip = PromptCLIPEmbedder(dtype=dtype)  # ViT-H text (354M)
    schedule = DiffusionSchedule.create(
        timesteps=1000, beta_schedule="linear", linear_start=0.00085, linear_end=0.0120
    )
    model = LeftRefillModel(unet=unet, vae=vae, cond_model=clip, schedule=schedule)

    k = jax.random.PRNGKey(0)
    params = {
        "unet": jax.jit(unet.init)(
            k, jnp.zeros((1, 64, 128, 9)), jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 1024))
        )["params"],
        "vae": jax.jit(vae.init)(k, jnp.zeros((1, 64, 128, 3)))["params"],
        "cond": jax.jit(clip.init)(k, jnp.zeros((1, 77), jnp.int32))["params"],
    }
    if quant:
        from leftrefill_tpu.ops.quant import quantize_params_like

        q_struct = jax.eval_shape(
            unet.init, k, jnp.zeros((1, 64, 128, 9)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, 1024)),
        )["params"]
        params["unet"] = quantize_params_like(q_struct, params["unet"])
    if quant_vae:
        from leftrefill_tpu.ops.quant import quantize_params_like

        v_struct = jax.eval_shape(vae.init, k, jnp.zeros((1, 64, 128, 3)))["params"]
        params["vae"] = quantize_params_like(v_struct, params["vae"])
    return model, params


def main():
    from leftrefill_tpu.models.clip import build_prompt_tokenizer
    from leftrefill_tpu.pipeline import RefInpaintPipeline, stitch_canvas

    batch = int(os.environ.get("BENCH_BATCH", "1"))
    # dpm++2m@15: 2.03 canvases/s measured r4 AND more solver-accurate than
    # ddim@50 (see module docstring) — the recommended serving config.
    # (RefInpaintPipeline keeps ddim@50 as ITS default for reference-protocol
    # parity; pass sampler="dpm++2m", ddim_steps=15 to get this path.)
    steps = int(os.environ.get("BENCH_STEPS", "15"))
    # best-of-5: cross-process relay-state variance measured at ±10% on
    # nominally identical runs (r3); more min-samples tightens the recording
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    sampler = os.environ.get("BENCH_SAMPLER", "dpm++2m")
    # W8A8 int8 UNet is the recorded default since round 3: the synthetic
    # quality bound is tight (bf16-vs-int8 full-pipeline PSNR 48.3 dB / 45.3
    # right-half, maxdiff 0.078 — scripts/tpu_r3_pipeline_ab.py, PARITY.md;
    # eps deviation mean 3.6% per forward, cancels through the sampler).
    # BENCH_QUANT=0 restores the bf16 path.
    quant = os.environ.get("BENCH_QUANT", "1") == "1"
    # opt-in: W8A8 on the VAE decoder res-block convs too (quality A/B first)
    quant_vae = os.environ.get("BENCH_QUANT_VAE", "0") == "1"

    # canvases per timing call, run back-to-back ON DEVICE (lax.scan over
    # keys): measures the serving steady state.  Per-dispatch host overhead
    # through the axon relay is ~0.2s/call — an artifact of this tunneled
    # environment (sub-ms on a local TPU host), so it is amortized here, not
    # measured.  BENCH_INNER=1 restores the one-dispatch-per-canvas timing.
    inner = int(os.environ.get("BENCH_INNER", "3"))

    model, params = build_full_bundle(quant=quant, quant_vae=quant_vae)
    import functools
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tok, sp, _ = build_prompt_tokenizer(["repeat_50_<special-token>"], ["init"])
    pipe = RefInpaintPipeline(
        model=model, params=params, tokenizer=tok, special_tokens=sp,
        ddim_steps=steps, guidance_scale=2.5, eta=1.0, sampler=sampler,
    )

    rng = np.random.RandomState(0)
    ref = rng.uniform(-1, 1, (batch, 512, 512, 3)).astype(np.float32)
    src = rng.uniform(-1, 1, (batch, 512, 512, 3)).astype(np.float32)
    image, mask = stitch_canvas(ref, src, np.ones((batch, 512, 512, 1), np.float32))

    from leftrefill_tpu.pipeline import _generate

    gen = functools.partial(
        _generate, model=model, ddim_steps=steps, eta=1.0,
        guidance_scale=2.5, sampler=sampler,
    )

    @jax.jit
    def run_chain(params, image, mask, tok_, utok, keys):
        def body(_, key):
            return gen(params, image, mask, tok_, utok, key), None

        last, _ = jax.lax.scan(body, jnp.zeros_like(image), keys)
        return last

    img = jnp.asarray(image, jnp.float32)
    msk = jnp.asarray(mask, jnp.float32)
    tok_ = jnp.asarray(pipe.prompt_tokens(batch))
    utok = jnp.asarray(pipe.uncond_tokens(batch))

    # compile + warmup.  NOTE: block_until_ready() does not reliably block
    # through the axon TPU relay on this host, and materializing the full
    # canvas adds ~0.2s of tunnel transfer — so timing drains the device
    # queue by materializing a 4-byte scalar of the last output.
    drain = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    keys = lambda i: jax.random.split(jax.random.PRNGKey(i), inner)
    np.asarray(drain(run_chain(params, img, msk, tok_, utok, keys(0))))
    np.asarray(drain(run_chain(params, img, msk, tok_, utok, keys(1))))

    times = []
    for i in range(iters):
        t0 = time.time()
        out = run_chain(params, img, msk, tok_, utok, keys(2 + i))
        np.asarray(drain(out))
        times.append(time.time() - t0)
    dt = min(times)  # best-of: excludes host jitter on the tunnel
    canvases_per_sec = batch * inner / dt

    target = 2.0  # BASELINE.json north star: >=2 canvases/sec/chip
    print(
        json.dumps(
            {
                "metric": (
                    f"canvases_per_sec_512x1024_{steps}step"
                    f"{'_' + sampler if sampler != 'ddim' else ''}"
                    f"{'_int8' if quant else ''}{'_vae8' if quant_vae else ''}"
                    f"_cfg2.5_b{batch}"
                ),
                "value": round(canvases_per_sec, 4),
                "unit": "canvases/sec/chip",
                "vs_baseline": round(canvases_per_sec / target, 4),
                # protocol disambiguation (ADVICE r4): "reference" = the
                # repo's measured eval protocol (ddim@50 eta1 cfg2.5);
                # anything else is a faster-solver serving config whose
                # accuracy bound lives in scripts/*_quality.py + BASELINE.md
                "protocol": (
                    "reference_ddim50"
                    if (sampler == "ddim" and steps == 50)
                    else f"{sampler}@{steps}"
                ),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
