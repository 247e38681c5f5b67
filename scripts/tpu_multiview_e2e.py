"""End-to-end multiview sampling throughput: one 2-view scene, 50-step DDIM
with batched CFG through the FULL-SIZE MultiViewUnetModel + VAE decode of
both canvases.  The multiview counterpart of bench.py's headline metric
(reference path: test_multiview_inpainting.py + multiview_unet.py)."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

print("backend:", jax.devices()[0].platform, flush=True)

from leftrefill_tpu.diffusion.schedules import DiffusionSchedule
from leftrefill_tpu.models.autoencoder import AutoencoderKL, DDConfig
from leftrefill_tpu.models.multiview import MultiViewUnetModel

import os

V = int(os.environ.get("MV_VIEWS", "2"))  # joint-attn views (reference view_num)
QUANT = os.environ.get("MV_QUANT", "0") == "1"  # W8A8 int8 UNet variant
STEPS = int(os.environ.get("MV_STEPS", "50"))
SAMPLER = os.environ.get("MV_SAMPLER", "ddim")  # "dpm++2m": 20-step fast path
unet = MultiViewUnetModel(view_num=V, dtype=jnp.bfloat16, quant=QUANT)
vae = AutoencoderKL(ddconfig=DDConfig(), embed_dim=4, dtype=jnp.bfloat16)
schedule = DiffusionSchedule.create(
    timesteps=1000, beta_schedule="linear", linear_start=0.00085, linear_end=0.0120
)
tables = schedule.ddim_tables(STEPS, eta=1.0)

zeros = lambda shapes: jax.tree_util.tree_map(
    lambda s: (jnp.ones(s.shape, s.dtype) * 0.002).astype(
        jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype
    ),
    shapes,
)
u_struct = jax.eval_shape(unet.init, jax.random.PRNGKey(0),
                          jnp.zeros((V, 64, 128, 9)), jnp.zeros((V,), jnp.int32),
                          jnp.zeros((V, 77, 1024)))
up = zeros(u_struct)
if QUANT:
    from leftrefill_tpu.ops.quant import quantize_params_like

    up = {"params": quantize_params_like(u_struct["params"], up["params"])}
vp = zeros(jax.eval_shape(vae.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3))))
print(f"params built (quant={QUANT})", flush=True)

c_concat = jnp.zeros((V, 64, 128, 5), jnp.bfloat16)
ctx_c = jnp.zeros((V, 77, 1024), jnp.bfloat16)
ctx_u = jnp.zeros((V, 77, 1024), jnp.bfloat16)

import functools
import types

from leftrefill_tpu.diffusion.core import Conditioning
from leftrefill_tpu.diffusion.samplers_extra import dpm_solver_pp_2m_sample

# duck-typed model handle for the shared sampler (it reads only .schedule
# and .parameterization; the UNet goes through apply_fn)
_mv_model = types.SimpleNamespace(schedule=schedule, parameterization="eps")


@jax.jit
def sample_dpm(up, vp, key):
    kv = unet.apply(up, jnp.concatenate([ctx_u, ctx_c], 0), method="cross_kv")

    def apply_fn(x, t, c):
        xin = jnp.concatenate([x.astype(jnp.bfloat16), c.c_concat], -1)
        return unet.apply(up, xin, t, c.c_crossattn, cross_kv=kv).astype(jnp.float32)

    cond = Conditioning(c_concat=c_concat, c_crossattn=ctx_c)
    uncond = Conditioning(c_concat=c_concat, c_crossattn=ctx_u)
    x = dpm_solver_pp_2m_sample(
        _mv_model, apply_fn, tables, cond, key, (V, 64, 128, 4),
        uncond=uncond, guidance_scale=2.5, num_steps=STEPS,
    )
    img = vae.apply(vp, x.astype(jnp.bfloat16) / 0.18215, method=vae.decode)
    return jnp.sum(img.astype(jnp.float32))


@functools.partial(jax.jit, static_argnums=())
def sample(up, vp, key):
    a = jnp.asarray(tables.alphas, jnp.float32)
    ap = jnp.asarray(tables.alphas_prev, jnp.float32)
    sig = jnp.asarray(tables.sigmas, jnp.float32)
    ts = jnp.asarray(tables.timesteps, jnp.int32)
    x = jax.random.normal(key, (V, 64, 128, 4), jnp.float32)
    # conditioning KV cache: projections of the fixed CFG context, once
    kv = unet.apply(up, jnp.concatenate([ctx_u, ctx_c], 0), method="cross_kv")

    def step(carry, i):
        x, key = carry
        idx = tables.num_steps - 1 - i
        t = jnp.full((2 * V,), ts[idx], jnp.int32)
        xin = jnp.concatenate([x, x], 0).astype(jnp.bfloat16)
        cc = jnp.concatenate([c_concat, c_concat], 0)
        cx = jnp.concatenate([ctx_u, ctx_c], 0)
        eps = unet.apply(up, jnp.concatenate([xin, cc], -1), t, cx, cross_kv=kv).astype(jnp.float32)
        e_u, e_c = eps[:V], eps[V:]
        e = e_u + 2.5 * (e_c - e_u)
        at, atp, s_ = a[idx], ap[idx], sig[idx]
        x0 = (x - jnp.sqrt(1 - at) * e) / jnp.sqrt(at)
        key, nk = jax.random.split(key)
        noise = jax.random.normal(nk, x.shape, jnp.float32)
        x = jnp.sqrt(atp) * x0 + jnp.sqrt(1 - atp - s_**2) * e + s_ * noise
        return (x, key), None

    (x, _), _ = jax.lax.scan(step, (x, key), jnp.arange(tables.num_steps))
    img = vae.apply(vp, x.astype(jnp.bfloat16) / 0.18215, method=vae.decode)
    return jnp.sum(img.astype(jnp.float32))

run = sample_dpm if SAMPLER == "dpm++2m" else sample
t0 = time.perf_counter()
print("first:", float(run(up, vp, jax.random.PRNGKey(0))),
      f"compile+run {time.perf_counter()-t0:.1f}s", flush=True)
ts_ = []
for i in range(3):
    t0 = time.perf_counter()
    float(run(up, vp, jax.random.PRNGKey(i + 1)))
    ts_.append(time.perf_counter() - t0)
dt = min(ts_)
print(json.dumps({
    "metric": (
        f"multiview_scenes_per_sec_{V}view_{STEPS}step"
        f"{'_' + SAMPLER if SAMPLER != 'ddim' else ''}"
        f"{'_int8' if QUANT else ''}_cfg2.5"
    ),
    "value": round(1.0 / dt, 4), "unit": "scenes/sec/chip",
    "seconds_per_scene": round(dt, 3),
}), flush=True)
print("MV E2E DONE", flush=True)
