"""Round-3: attribute the ~19.7ms of transformer time in the int8 UNet fwd
(b2).  Times the full UNet with attention/FF pieces replaced by identities
(param-compatible), plus direct kernel timings at the exact shapes."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import flax.linen as nn

print("backend:", jax.devices()[0].platform, flush=True)

import leftrefill_tpu.models.unet as unet_mod
from leftrefill_tpu.ops.quant import quantize_params_like


def timed(fn, x, *rest, iters=60):
    def body(c, _):
        return fn(c, *rest), None
    loop = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=iters)[0])
    drain = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    float(drain(loop(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(drain(loop(x))); ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


z = jnp.ones((8, 128), jnp.bfloat16)
t0 = timed(lambda c: c + 1.0, z)
print(f"floor: {t0*1e3:.3f} ms", flush=True)


def fake_mha(q, k, v, num_heads, impl=None):
    return q  # same shape/dtype, near-free


class FakeFF(unet_mod.GEGLUFeedForward):
    @nn.compact
    def __call__(self, x):
        return x  # paramless stand-in (init/quantize use the same patched model)


def unet_time(label, quant=True, mha=None, ff=None, **kw):
    orig_mha = unet_mod.multi_head_attention
    orig_ff = unet_mod.GEGLUFeedForward
    try:
        if mha is not None:
            unet_mod.multi_head_attention = mha
        if ff is not None:
            unet_mod.GEGLUFeedForward = ff
        m = unet_mod.UNetModel(dtype=jnp.bfloat16, quant=quant, **kw)
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
        print(f"{label}: {t*1e3:.2f} ms", flush=True)
        return t
    finally:
        unet_mod.multi_head_attention = orig_mha
        unet_mod.GEGLUFeedForward = orig_ff


unet_time("full int8 stock")
unet_time("int8, mha->identity", mha=fake_mha)
unet_time("int8, ff->identity", ff=FakeFF)
unet_time("int8, mha+ff->identity", mha=fake_mha, ff=FakeFF)

# direct flash timings at the UNet self-attn shapes (with head transposes)
from leftrefill_tpu.ops.attention import multi_head_attention
for (N, C, H) in [(8192, 320, 5), (2048, 640, 10), (512, 1280, 20)]:
    q = jax.random.normal(jax.random.PRNGKey(1), (2, N, C), jnp.bfloat16)
    t = timed(lambda c: multi_head_attention(c, c, c, H), q, iters=100)
    print(f"mha self N={N} C={C}: {t*1e3:.3f} ms", flush=True)
    ctx77 = jax.random.normal(jax.random.PRNGKey(2), (2, 77, C), jnp.bfloat16)
    t = timed(lambda c: multi_head_attention(c, ctx77, ctx77, H), q, iters=100)
    print(f"mha cross N={N} Nk=77 C={C}: {t*1e3:.3f} ms", flush=True)
print("SPLIT3 DONE", flush=True)
