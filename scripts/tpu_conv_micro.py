"""Floor-free conv micro-bench (iters=300): isolated conv vs the real graph
pattern GN+SiLU+conv, pallas vs xla, at the bench shape (b2, L0/L1)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import leftrefill_tpu.ops.conv as C
from leftrefill_tpu.ops.layers import GroupNorm32
print("backend:", jax.devices()[0].platform, flush=True)

def timed_chain(fn, x, *rest, iters=300):
    def body(c, _):
        o = fn(c, *rest)
        return (o * 1e-3).astype(c.dtype), None
    loop = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=iters)[0])
    drain = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    float(drain(loop(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(drain(loop(x))); ts.append((time.perf_counter()-t0)/iters)
    return min(ts)

z = jnp.ones((8, 128), jnp.bfloat16)
print(f"floor: {timed_chain(lambda c: c + 1.0, z)*1e3:.4f} ms/iter", flush=True)

import flax.linen as nn
def gn_silu(x, scale, bias):
    # GroupNorm32(32) semantics inline (fp32 stats) + silu
    xf = x.astype(jnp.float32)
    b, h, w, c = x.shape
    g = xf.reshape(b, h, w, 32, c // 32)
    mean = g.mean(axis=(1, 2, 4), keepdims=True)
    var = ((g - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    xn = ((g - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(b, h, w, c)
    return jax.nn.silu(xn * scale + bias).astype(x.dtype)

for (B,h,w,ci,co) in [(2,64,128,320,320),(2,32,64,640,640)]:
    ks = jax.random.split(jax.random.PRNGKey(0),5)
    x = jax.random.normal(ks[0],(B,h,w,ci),jnp.bfloat16)*0.1
    wk = (jax.random.normal(ks[1],(3,3,ci,co),jnp.float32)*0.02).astype(jnp.bfloat16)
    bias = jnp.zeros((co,),jnp.bfloat16)
    gs = jnp.ones((ci,), jnp.float32); gb = jnp.zeros((ci,), jnp.float32)
    fl = 2*9*B*h*w*ci*co
    for mode in ("sum9","concat"):
        C.set_conv_tap_mode(mode)
        t1 = timed_chain(C.conv3x3_op, x, wk, bias)
        t2 = timed_chain(lambda c, wk, bias: C.conv3x3_op(gn_silu(c, gs, gb), wk, bias), x, wk, bias)
        print(f"{B}x{h}x{w} {ci}->{co} pallas[{mode}]: conv={t1*1e3:.3f}ms({fl/t1/1e12:.0f}TF) gn+silu+conv={t2*1e3:.3f}ms", flush=True)
    t1 = timed_chain(C._xla_conv, x, wk, bias)
    t2 = timed_chain(lambda c, wk, bias: C._xla_conv(gn_silu(c, gs, gb), wk, bias), x, wk, bias)
    print(f"{B}x{h}x{w} {ci}->{co} xla: conv={t1*1e3:.3f}ms({fl/t1/1e12:.0f}TF) gn+silu+conv={t2*1e3:.3f}ms", flush=True)
C.set_conv_tap_mode("sum9")
print("MICRO DONE", flush=True)
