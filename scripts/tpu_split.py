"""Where do the 36ms of UNet forward go?  Compile variants: full, conv-only
(no transformers), and direct flash timings at the exact UNet shapes."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.devices()[0].platform, flush=True)

def timed_chain(fn, x, *rest, iters=30):
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

# calibration floor: trivial op
z = jnp.ones((8, 128), jnp.bfloat16)
t0 = timed_chain(lambda c: c + 1.0, z, iters=30)
print(f"floor (tiny add): {t0*1e3:.3f} ms/iter", flush=True)

from leftrefill_tpu.models.unet import UNetModel

def unet_time(label, **kw):
    m = UNetModel(dtype=jnp.bfloat16, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 128, 9), jnp.bfloat16)
    t_ = jnp.array([500, 500], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 1024), jnp.bfloat16)
    shapes = jax.eval_shape(m.init, jax.random.PRNGKey(2), x, t_, ctx)
    params = jax.tree_util.tree_map(lambda s: (jnp.ones(s.shape, s.dtype)*0.002).astype(s.dtype), shapes)
    def fwd(c, p, t_, ctx):
        o = m.apply(p, c[..., :9], t_, ctx)
        return jnp.concatenate([o, o, c[..., :1]], axis=-1) * 1e-3
    t = timed_chain(fwd, x, params, t_, ctx, iters=20)
    print(f"{label}: {t*1e3:.2f} ms", flush=True)
    return t

unet_time("full unet")
unet_time("no transformers (convs+GN only)", attention_resolutions=())
unet_time("attn at ds2,4 only (no ds1 transformer)", attention_resolutions=(4, 2))

# direct flash at the UNet ds1 self-attn shape: B=2, H=5, N=8192, D=64
from leftrefill_tpu.ops.flash_attention import flash_attention
for (B,H,N) in [(2,5,8192),(2,10,2048),(2,20,512)]:
    q,k,v = (jax.random.normal(s,(B,H,N,64),jnp.bfloat16) for s in jax.random.split(jax.random.PRNGKey(2),3))
    t = timed_chain(lambda q,k,v: flash_attention(q,k,v,64**-0.5), q,k,v, iters=30)
    fl = 4*B*H*N*N*64
    print(f"flash fwd B{B} H{H} N{N}: {t*1e3:.3f} ms ({fl/t/1e12:.0f} TF/s)", flush=True)
print("SPLIT DONE", flush=True)
