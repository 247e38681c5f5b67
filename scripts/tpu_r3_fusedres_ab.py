"""Round-3: in-process A/B of the fused GN+SiLU+quant+conv ResBlock path vs
the unfused chain — same harness, same weights, UNet fwd b2 AND a 10-step
DDIM-like scan of the forward (the bench showed fused SLOWER end-to-end while
the plain fwd measure said faster; find where they diverge)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

print("backend:", jax.devices()[0].platform, flush=True)

from leftrefill_tpu.models.unet import UNetModel
from leftrefill_tpu.ops.quant import quantize_params_like


def timed(fn, x, *rest, iters=30):
    def body(c, _):
        return fn(c, *rest), None
    loop = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=iters)[0])
    drain = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    float(drain(loop(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(drain(loop(x))); ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


m = UNetModel(dtype=jnp.bfloat16, quant=True)
xin = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 128, 9), jnp.bfloat16)
tt = jnp.array([500, 500], jnp.int32)
ctx = jax.random.normal(jax.random.PRNGKey(6), (2, 77, 1024), jnp.bfloat16)
shapes = jax.eval_shape(m.init, jax.random.PRNGKey(7), xin, tt, ctx)
params = jax.tree_util.tree_map(
    lambda s: (jnp.ones(s.shape, jnp.float32) * 0.002).astype(s.dtype), shapes
)
params = {"params": quantize_params_like(shapes["params"], params["params"])}


def fwd(c, p, tt, ctx):
    o = m.apply(p, c[..., :9], tt, ctx)
    return jnp.concatenate([o, o, c[..., :1]], axis=-1) * 1e-3 + c * 0.999


for flag in ("1", "0"):
    os.environ["LEFTREFILL_FUSED_RES"] = flag
    t = timed(fwd, xin, params, tt, ctx)
    name = "fused" if flag == "1" else "unfused"
    print(f"UNet fwd b2 int8 [{name}]: {t*1e3:.2f} ms", flush=True)

# now the bench-like shape: UNet called on a CARRIED latent inside a scan
# with timestep indexing, like diffusion/ddim.py's sampler body
def step(lat, p, ctx):
    def body(c, t):
        pad = jnp.zeros(c.shape[:-1] + (5,), c.dtype)
        eps = m.apply(p, jnp.concatenate([c, pad], axis=-1), jnp.full((2,), t, jnp.int32), ctx)
        return c * 0.99 + eps.astype(c.dtype) * 0.01, ()
    out, _ = jax.lax.scan(body, lat, jnp.arange(10, dtype=jnp.int32))
    return out

lat = xin[..., :4]
for flag in ("1", "0"):
    os.environ["LEFTREFILL_FUSED_RES"] = flag
    loop = jax.jit(lambda l: step(l, params, ctx))
    drain = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    float(drain(loop(lat)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(drain(loop(lat))); ts.append((time.perf_counter() - t0) / 10)
    name = "fused" if flag == "1" else "unfused"
    print(f"DDIM-like scan step b2 int8 [{name}]: {min(ts)*1e3:.2f} ms", flush=True)

print("AB DONE", flush=True)
