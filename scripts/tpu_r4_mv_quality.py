"""Round-4, VERDICT item 6: synthetic quality bound for the MULTIVIEW int8
path (MV_QUANT) — the multiview counterpart of scripts/tpu_r3_int8_quality.py.

Measures, on the full-size MultiViewUnetModel (V=2, joint 2x8192-token
self-attention, reference: ldm/modules/multiview_attention.py:394-468) with
realistically-initialized random weights:

  1. eps-output deviation of bf16 and int8-W8A8 forwards vs an fp32
     reference forward, over a sweep of timesteps (the same bound PARITY.md
     records for the 1-ref UNet: int8 eps mean ~3.6%);
  2. end-to-end scene A/B: one 2-view 50-step CFG DDIM sample + VAE decode,
     bf16 vs int8 from the same seed (PSNR between the two scenes).

Caveat: random weights bound kernel/quantization noise, not model quality
(needs the real ckpt — runbook item 4).

Run detached (ONE TPU process at a time):
  nohup python scripts/tpu_r4_mv_quality.py > /tmp/mv_quality_r4.log 2>&1 &
"""
import sys, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

print("backend:", jax.devices()[0].platform, flush=True)

from leftrefill_tpu.runtime import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from leftrefill_tpu.models.multiview import MultiViewUnetModel
from leftrefill_tpu.ops.quant import quantize_params_like

V = int(__import__("os").environ.get("MV_VIEWS", "2"))
x = jax.random.normal(jax.random.PRNGKey(0), (V, 64, 128, 9), jnp.float32)
ctx = jax.random.normal(jax.random.PRNGKey(1), (V, 77, 1024), jnp.float32) * 0.5

m32 = MultiViewUnetModel(view_num=V, dtype=jnp.float32)
shapes = jax.eval_shape(
    m32.init, jax.random.PRNGKey(2), x, jnp.zeros((V,), jnp.int32), ctx
)["params"]
rng = np.random.RandomState(0)


def mk(path, s):
    name = getattr(path[-1], "key", str(path[-1]))
    if len(s.shape) >= 2:
        fan_in = int(np.prod(s.shape[:-1]))
        arr = rng.randn(*s.shape).astype(np.float32) / np.sqrt(max(fan_in, 1))
        return jnp.asarray(arr, s.dtype)
    if name == "scale":
        return jnp.ones(s.shape, s.dtype)
    return jnp.asarray(rng.randn(*s.shape).astype(np.float32) * 0.02, s.dtype)


params = jax.tree_util.tree_map_with_path(mk, shapes)
print("params ready", flush=True)

m_bf16 = MultiViewUnetModel(view_num=V, dtype=jnp.bfloat16)
m_int8 = MultiViewUnetModel(view_num=V, dtype=jnp.bfloat16, quant=True)
q_struct = jax.eval_shape(
    m_int8.init, jax.random.PRNGKey(2), x, jnp.zeros((V,), jnp.int32), ctx
)["params"]
qparams = quantize_params_like(q_struct, params)

apply32 = jax.jit(lambda p, x, t, c: m32.apply({"params": p}, x, t, c))
apply16 = jax.jit(lambda p, x, t, c: m_bf16.apply({"params": p}, x, t, c))
apply8 = jax.jit(lambda p, x, t, c: m_int8.apply({"params": p}, x, t, c))

for t_val in (1, 250, 500, 750, 999):
    tt = jnp.full((V,), t_val, jnp.int32)
    ref = np.asarray(apply32(params, x, tt, ctx), np.float32)
    rms = float(np.sqrt((ref**2).mean()))
    line = {"t": t_val, "ref_rms": round(rms, 5)}
    for name, fn, p in (("bf16", apply16, params), ("int8", apply8, qparams)):
        out = np.asarray(fn(p, x, tt, ctx), np.float32)
        d = np.abs(out - ref)
        line[name] = {
            "max_rel": round(float(d.max() / rms), 5),
            "mean_rel": round(float(d.mean() / rms), 6),
        }
    print(json.dumps(line), flush=True)

# ---------------------------------------------------------------------------
# end-to-end 2-view scene A/B (bf16 vs int8, same seed): the sampling loop
# mirrors scripts/tpu_multiview_e2e.py (50-step CFG DDIM + VAE decode)
print("scene A/B...", flush=True)
from leftrefill_tpu.diffusion.schedules import DiffusionSchedule
from leftrefill_tpu.models.autoencoder import AutoencoderKL, DDConfig

vae = AutoencoderKL(ddconfig=DDConfig(), embed_dim=4, dtype=jnp.bfloat16)
v_shapes = jax.eval_shape(vae.init, jax.random.PRNGKey(3), jnp.zeros((1, 64, 128, 3)))[
    "params"
]
vparams = jax.tree_util.tree_map_with_path(mk, v_shapes)
schedule = DiffusionSchedule.create(
    timesteps=1000, beta_schedule="linear", linear_start=0.00085, linear_end=0.0120
)
tables = schedule.ddim_tables(50, eta=1.0)
c_concat = jnp.zeros((V, 64, 128, 5), jnp.bfloat16)
ctx_c = jnp.asarray(ctx, jnp.bfloat16)
ctx_u = jnp.zeros((V, 77, 1024), jnp.bfloat16)

outs = {}
for name, unet, up in (("bf16", m_bf16, params), ("int8", m_int8, qparams)):

    @jax.jit
    def sample(up, vp, key, unet=unet):
        a = jnp.asarray(tables.alphas, jnp.float32)
        ap = jnp.asarray(tables.alphas_prev, jnp.float32)
        sig = jnp.asarray(tables.sigmas, jnp.float32)
        ts = jnp.asarray(tables.timesteps, jnp.int32)
        x = jax.random.normal(key, (V, 64, 128, 4), jnp.float32)
        kv = unet.apply(
            {"params": up}, jnp.concatenate([ctx_u, ctx_c], 0), method="cross_kv"
        )

        def step(carry, i):
            x, key = carry
            idx = tables.num_steps - 1 - i
            t = jnp.full((2 * V,), ts[idx], jnp.int32)
            xin = jnp.concatenate([x, x], 0).astype(jnp.bfloat16)
            cc = jnp.concatenate([c_concat, c_concat], 0)
            cx = jnp.concatenate([ctx_u, ctx_c], 0)
            eps = unet.apply(
                {"params": up}, jnp.concatenate([xin, cc], -1), t, cx, cross_kv=kv
            ).astype(jnp.float32)
            e_u, e_c = eps[:V], eps[V:]
            e = e_u + 2.5 * (e_c - e_u)
            at, atp, s_ = a[idx], ap[idx], sig[idx]
            x0 = (x - jnp.sqrt(1 - at) * e) / jnp.sqrt(at)
            key, nk = jax.random.split(key)
            noise = jax.random.normal(nk, x.shape, jnp.float32)
            x = jnp.sqrt(atp) * x0 + jnp.sqrt(1 - atp - s_**2) * e + s_ * noise
            return (x, key), None

        (x, _), _ = jax.lax.scan(step, (x, key), jnp.arange(tables.num_steps))
        return vae.apply(
            {"params": vp}, x.astype(jnp.bfloat16) / 0.18215, method=vae.decode
        )

    outs[name] = np.asarray(sample(up, vparams, jax.random.PRNGKey(7)), np.float32)
    print(f"scene {name} done", flush=True)

a, b = outs["bf16"], outs["int8"]
mse = float(((a - b) ** 2).mean())
psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
print(
    json.dumps(
        {
            "mv_scene_ab": {
                "mse": round(mse, 8),
                "psnr_bf16_vs_int8_db": round(psnr, 2),
                "maxdiff": round(float(np.abs(a - b).max()), 5),
            }
        }
    ),
    flush=True,
)
print("MV QUALITY DONE", flush=True)
