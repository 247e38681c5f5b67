"""Round-3: measure the fused GEGLU kernel — direct at the three transformer
shapes (fused vs XLA dense chain, bf16 + int8) and the full UNet fwd b2."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

print("backend:", jax.devices()[0].platform, flush=True)

import leftrefill_tpu.ops.mlp as mlp
from leftrefill_tpu.ops.mlp import geglu_fused, geglu_fused_int8
from leftrefill_tpu.ops.quant import quantize_weight, quantize_params_like


def timed(fn, *args, iters=100):
    x = args[0]

    def body(c, _):
        o = fn(c, *args[1:])
        o = o.reshape(c.shape) if o.size == c.size else jnp.broadcast_to(jnp.sum(o) * 1e-9, c.shape) + c
        return (o * 0.5 + c * 0.5).astype(c.dtype), None

    loop = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=iters)[0])
    drain = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    float(drain(loop(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(drain(loop(x))); ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


z = jnp.ones((8, 128), jnp.bfloat16)
print(f"floor: {timed(lambda c: c + 1.0, z)*1e3:.3f} ms", flush=True)

# direct kernels at the UNet transformer shapes (R = 2*N for CFG b2)
for (R, dim) in [(16384, 320), (4096, 640), (1024, 1280)]:
    inner = dim * 4
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (R, dim), jnp.bfloat16)
    w1 = jax.random.normal(ks[1], (dim, 2 * inner), jnp.float32) * 0.05
    b1 = jnp.zeros((2 * inner,), jnp.float32)
    w2 = jax.random.normal(ks[2], (inner, dim), jnp.float32) * 0.05
    b2 = jnp.zeros((dim,), jnp.float32)
    fl = 2 * R * dim * 2 * inner + 2 * R * inner * dim

    def xla_ff(c):
        xg = c @ w1.astype(jnp.bfloat16) + b1.astype(jnp.bfloat16)
        val, gate = jnp.split(xg, 2, axis=-1)
        h = val * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(val.dtype)
        return h @ w2.astype(jnp.bfloat16) + b2.astype(jnp.bfloat16)

    t = timed(xla_ff, x)
    print(f"R={R} d={dim} XLA bf16: {t*1e3:.3f} ms ({fl/t/1e12:.0f} TF/s)", flush=True)
    t = timed(lambda c: geglu_fused(c, w1, b1, w2, b2), x)
    print(f"R={R} d={dim} fused bf16: {t*1e3:.3f} ms ({fl/t/1e12:.0f} TF/s)", flush=True)
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    t = timed(lambda c: geglu_fused_int8(c, w1q, s1, b1, w2q, s2, b2), x)
    print(f"R={R} d={dim} fused int8: {t*1e3:.3f} ms ({fl/t/1e12:.0f} TOPS-equiv)", flush=True)

# full UNet fwd b2
from leftrefill_tpu.models.unet import UNetModel

for quant in (True, False):
    for fused in (True, False):
        mlp.set_geglu_fused(fused)
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

        t = timed(fwd, xin, params, tt, ctx, iters=30)
        print(f"UNet fwd b2 {'int8' if quant else 'bf16'} fused={fused}: {t*1e3:.2f} ms", flush=True)
mlp.set_geglu_fused(True)
print("GEGLU MEASURE DONE", flush=True)
