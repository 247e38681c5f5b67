"""Round-3: in-process A/B of the int8 GEGLU second-GEMM variant — per-chunk
requant + int8 dot vs bf16 dot on raw int8 weight values (no requant chain)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

print("backend:", jax.devices()[0].platform, flush=True)

from leftrefill_tpu.ops import mlp
from leftrefill_tpu.ops.quant import quantize_weight
import leftrefill_tpu.models.unet as unet_mod
from leftrefill_tpu.ops.quant import quantize_params_like


def timed_chain(fn, x, iters=100):
    def body(c, _):
        return fn(c), None
    loop = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=iters)[0])
    drain = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    float(drain(loop(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(drain(loop(x))); ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


for (R, d) in [(16384, 320), (4096, 640), (1024, 1280)]:
    inner = 4 * d
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], (R, d), jnp.bfloat16)
    w1 = jax.random.normal(ks[1], (d, 2 * inner), jnp.float32) * 0.03
    b1 = jnp.zeros((2 * inner,), jnp.float32)
    w2 = jax.random.normal(ks[2], (inner, d), jnp.float32) * 0.03
    b2 = jnp.zeros((d,), jnp.float32)
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    ref = np.asarray(mlp.geglu_reference(x, w1, b1, w2, b2))

    for variant in ("int8", "bf16"):
        os.environ["LEFTREFILL_GEGLU_INT8_W2"] = variant

        def fn(c):
            o = mlp.geglu_fused_int8(c, w1q, s1, b1, w2q, s2, b2)
            return o * 1e-3 + c * 0.999  # chain: same shape

        out = np.asarray(jax.jit(lambda c: mlp.geglu_fused_int8(c, w1q, s1, b1, w2q, s2, b2))(x), np.float32)
        rel = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
        t = timed_chain(fn, x)
        fl = 2 * R * d * 2 * inner + 2 * R * inner * d
        print(f"R={R} d={d} w2={variant}: {t*1e3:.3f} ms ({fl/t/1e12:.0f} TOPS-eq) rel={rel:.4f}", flush=True)

# full UNet fwd with both variants
m = unet_mod.UNetModel(dtype=jnp.bfloat16, quant=True)
xin = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 128, 9), jnp.bfloat16)
tt = jnp.array([500, 500], jnp.int32)
ctx = jax.random.normal(jax.random.PRNGKey(6), (2, 77, 1024), jnp.bfloat16)
shapes = jax.eval_shape(m.init, jax.random.PRNGKey(7), xin, tt, ctx)
params = jax.tree_util.tree_map(
    lambda s: (jnp.ones(s.shape, jnp.float32) * 0.002).astype(s.dtype), shapes
)
params = {"params": quantize_params_like(shapes["params"], params["params"])}


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


def fwd(c, p, tt, ctx):
    o = m.apply(p, c[..., :9], tt, ctx)
    return jnp.concatenate([o, o, c[..., :1]], axis=-1) * 1e-3 + c * 0.999


for variant in ("bf16", "int8"):
    os.environ["LEFTREFILL_GEGLU_INT8_W2"] = variant
    t = timed(fwd, xin, params, tt, ctx)
    print(f"UNet fwd b2 int8 [geglu_w2={variant}]: {t*1e3:.2f} ms", flush=True)
print("GEGLU W2 AB DONE", flush=True)
