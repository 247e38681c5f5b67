"""Follow-up TPU batch: (1) UNet forward ablation, (2) per-kernel conv A/B
with the fixed VMEM budget, (3) batched bench sensitivity."""
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

# --- 1. full UNet forward time (the 50x2-per-canvas hot path) --------------
from leftrefill_tpu.models.unet import UNetModel
import leftrefill_tpu.ops.conv as C
import leftrefill_tpu.ops.attention as A

unet = UNetModel(dtype=jnp.bfloat16)
x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 128, 9), jnp.bfloat16)
t_ = jnp.array([500, 500], jnp.int32)
ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 1024), jnp.bfloat16)
shapes = jax.eval_shape(unet.init, jax.random.PRNGKey(2), x, t_, ctx)
params = jax.tree_util.tree_map(
    lambda s: (jnp.ones(s.shape, s.dtype) * 0.002).astype(s.dtype), shapes)

def fwd(c, p, t_, ctx):
    o = unet.apply(p, c[..., :9], t_, ctx)
    return jnp.concatenate([o, o, c[..., 8:9]], axis=-1)[..., :9]  # keep shape

for conv_impl in ("pallas", "xla"):
    C.set_conv_impl(conv_impl)
    for attn_impl in ("auto", "xla"):
        A.set_default_attn_impl(attn_impl)
        t = timed_chain(fwd, x, params, t_, ctx, iters=20)
        print(f"unet fwd b2 conv={conv_impl} attn={attn_impl}: {t*1e3:.2f} ms", flush=True)
C.set_conv_impl("auto"); A.set_default_attn_impl("auto")

# --- 2. conv kernel A/B with fixed budget ----------------------------------
SHAPES = [(2,64,128,320,320),(8,64,128,320,320),(2,32,64,640,640),(2,16,32,1280,1280)]
for (B,h,w,ci,co) in SHAPES:
    ks = jax.random.split(jax.random.PRNGKey(0),3)
    xx = jax.random.normal(ks[0],(B,h,w,ci),jnp.bfloat16)*0.1
    wk = (jax.random.normal(ks[1],(3,3,ci,co),jnp.float32)*0.02).astype(jnp.bfloat16)
    bias = jnp.zeros((co,),jnp.bfloat16)
    fl = 2*9*B*h*w*ci*co
    res = {}
    res["xla"] = timed_chain(C._xla_conv, xx, wk, bias)
    for mode in ("sum9","concat"):
        C.set_conv_tap_mode(mode)
        res[mode] = timed_chain(C.conv3x3_op, xx, wk, bias)
    msg = " ".join(f"{k}={v*1e3:.3f}ms({fl/v/1e12:.0f}TF)" for k,v in res.items())
    print(f"conv b{B} {h}x{w} {ci}->{co}: {msg}", flush=True)
C.set_conv_tap_mode("sum9")
print("FOLLOWUP DONE", flush=True)
