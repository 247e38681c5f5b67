"""Multi-reference consistent sampling throughput (VERDICT r2 item 9).

The reference loops K conditioning pairs sequentially per DDIM step
(/root/reference/ldm/models/diffusion/ddim.py:191-212); ddim_multi_sample
folds them into ONE 2*K*b CFG batch per step.  This measures the K=3
512x1024 protocol end-to-end on the chip (manual_pairs_x4 test mode,
test_inpainting.py --multi_test).

Run: nohup python scripts/tpu_multicond_bench.py > /tmp/mc_bench.log 2>&1 &
"""
import sys, time

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

print("backend:", jax.devices()[0].platform, flush=True)

from bench import build_full_bundle
from leftrefill_tpu.diffusion.core import Conditioning
from leftrefill_tpu.diffusion.ddim import ddim_multi_sample

K = int(__import__("os").environ.get("MC_K", "3"))
STEPS = int(__import__("os").environ.get("MC_STEPS", "50"))

model, params = build_full_bundle(quant=True)
print("params built", flush=True)

rng = np.random.RandomState(0)
img = jnp.asarray(rng.uniform(-1, 1, (K, 1, 512, 1024, 3)), jnp.float32)
mask = jnp.concatenate(
    [jnp.zeros((K, 1, 512, 512, 1)), jnp.ones((K, 1, 512, 512, 1))], axis=3
).astype(jnp.float32)
tok = jnp.zeros((K, 1, 77), jnp.int32).at[:, :, 0].set(1022)
utok = jnp.zeros((K, 1, 77), jnp.int32).at[:, :, 0].set(1022)


def run(params, key):
    # K conds: per-pair c_concat from each reference canvas, shared prompt
    conds = jax.vmap(
        lambda im, mk, tk: model.build_inpaint_cond(params, tk, mk, im * (mk < 0.5))
    )(img, mask, tok)
    unconds = Conditioning(
        c_concat=conds.c_concat,
        c_crossattn=jax.vmap(lambda tk: model.get_learned_conditioning(params, tk))(utok),
    )
    tables = model.schedule.ddim_tables(STEPS, eta=1.0)
    z = ddim_multi_sample(
        model, lambda x, t, c: model.apply_model(params, x, t, c),
        tables, conds, key, (1, 64, 128, 4), unconds=unconds, guidance_scale=2.5,
    )
    pred = model.decode_first_stage(params, z)
    return jnp.clip(pred, -1.0, 1.0)


jrun = jax.jit(run)
drain = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
t0 = time.time()
out = jrun(params, jax.random.PRNGKey(0))
print("first:", float(drain(out)), f"compile+run {time.time()-t0:.1f}s", flush=True)

times = []
for i in range(3):
    t0 = time.time()
    float(drain(jrun(params, jax.random.PRNGKey(1 + i))))
    times.append(time.time() - t0)
dt = min(times)
import json

print(
    json.dumps(
        {
            "metric": f"multicond_canvases_per_sec_K{K}_{STEPS}step_int8_cfg2.5",
            "value": round(1.0 / dt, 4),
            "unit": "canvases/sec/chip",
            "seconds_per_canvas": round(dt, 3),
            "unet_batch_per_step": 2 * K,
        }
    ),
    flush=True,
)
print("MULTICOND BENCH DONE", flush=True)
