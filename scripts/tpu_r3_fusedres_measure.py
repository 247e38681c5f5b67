"""Round-3: UNet fwd b2 with the fused GN+SiLU+quantize+conv ResBlock path."""
import sys, time
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

# numeric sanity on chip: fused vs XLA-emulated closeness is covered by CPU
# tests; here check finiteness + magnitude
out = jax.jit(lambda p, c, t, x: m.apply(p, c, t, x))(params, xin, tt, ctx)
o = np.asarray(out, np.float32)
print(f"fwd out: finite={np.isfinite(o).all()} rms={float((o**2).mean())**0.5:.4f}", flush=True)


def fwd(c, p, tt, ctx):
    o = m.apply(p, c[..., :9], tt, ctx)
    return jnp.concatenate([o, o, c[..., :1]], axis=-1) * 1e-3 + c * 0.999

t = timed(fwd, xin, params, tt, ctx)
print(f"UNet fwd b2 int8 (fused ResBlock): {t*1e3:.2f} ms", flush=True)
print("FUSEDRES DONE", flush=True)
