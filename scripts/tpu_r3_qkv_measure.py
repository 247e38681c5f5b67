"""Round-3: UNet fwd b2 int8 after the fused-QKV projection (3 GEMMs -> 1 for
self-attn, 2 -> 1 for cross-attn k/v).  Compare against the committed
fused-ResBlock baseline of 29.70 ms (scripts/tpu_r3_fusedres_ab.py)."""
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


for quant in (True, False):
    m = UNetModel(dtype=jnp.bfloat16, quant=quant)
    xin = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 128, 9), jnp.bfloat16)
    tt = jnp.array([500, 500], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(6), (2, 77, 1024), jnp.bfloat16)
    shapes = jax.eval_shape(m.init, jax.random.PRNGKey(7), xin, tt, ctx)
    params = jax.tree_util.tree_map(
        lambda s: (jnp.ones(s.shape, jnp.float32) * 0.002).astype(s.dtype), shapes
    )
    if quant:
        params = {"params": quantize_params_like(shapes["params"], params["params"])}

    def fwd(c, p, tt, ctx):
        o = m.apply(p, c[..., :9], tt, ctx)
        return jnp.concatenate([o, o, c[..., :1]], axis=-1) * 1e-3 + c * 0.999

    t = timed(fwd, xin, params, tt, ctx)
    print(f"UNet fwd b2 {'int8' if quant else 'bf16'} (fused QKV): {t*1e3:.2f} ms", flush=True)
print("QKV DONE", flush=True)
