"""Consolidated TPU measurement: conv A/B (xla / pallas-sum9 / pallas-concat),
flash fwd/bwd timing.  Run as ONE process via nohup (relay-safe)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import leftrefill_tpu.ops.conv as C
from leftrefill_tpu.ops.flash_attention import flash_attention

print("backend:", jax.devices()[0].platform, flush=True)

def timed_chain(fn, x, *rest, iters=50):
    """Chain output->input (same shape) inside one jit; drain via scalar."""
    def body(c, _):
        o = fn(c, *rest)
        return (o * 1e-3).astype(c.dtype), None  # damp so values stay finite
    loop = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=iters)[0])
    drain = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    float(drain(loop(x)))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(drain(loop(x)))
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)

# baseline calibration
a = jax.random.normal(jax.random.PRNGKey(0), (4096, 4096), jnp.bfloat16) * 0.01
b = jax.random.normal(jax.random.PRNGKey(1), (4096, 4096), jnp.bfloat16) * 0.01
t = timed_chain(lambda x, y: x @ y, a, b)
print(f"calib matmul 4096^3: {t*1e3:.3f}ms ({2*4096**3/t/1e12:.0f} TF/s)", flush=True)

SHAPES = [(2,64,128,320,320),(8,64,128,320,320),(2,32,64,640,640),(2,16,32,1280,1280)]
for (B,h,w,ci,co) in SHAPES:
    ks = jax.random.split(jax.random.PRNGKey(0),3)
    x = jax.random.normal(ks[0],(B,h,w,ci),jnp.bfloat16)*0.1
    wk = (jax.random.normal(ks[1],(3,3,ci,co),jnp.float32)*0.02).astype(jnp.bfloat16)
    bias = jnp.zeros((co,),jnp.bfloat16)
    fl = 2*9*B*h*w*ci*co
    res = {}
    tx = timed_chain(C._xla_conv, x, wk, bias); res["xla"] = tx
    for mode in ("sum9","concat"):
        C.set_conv_tap_mode(mode)
        res[mode] = timed_chain(C.conv3x3_op, x, wk, bias)
    msg = " ".join(f"{k}={v*1e3:.3f}ms({fl/v/1e12:.0f}TF/s)" for k,v in res.items())
    print(f"conv b{B} {h}x{w} {ci}->{co}: {msg}", flush=True)
C.set_conv_tap_mode("sum9")

# flash fwd + bwd at ds1
B,H,N,D = 2,5,8192,64
scale = D**-0.5
q,k,v = (jax.random.normal(s,(B,H,N,D),jnp.bfloat16) for s in jax.random.split(jax.random.PRNGKey(2),3))
t = timed_chain(lambda q,k,v: flash_attention(q,k,v,scale), q,k,v, iters=30)
print(f"flash fwd N=8192: {t*1e3:.3f}ms ({4*B*H*N*N*D/t/1e12:.0f} TF/s)", flush=True)
def bwd_step(qc, k, v):
    o, vjp = jax.vjp(lambda a,b_,c: flash_attention(a,b_,c,scale), qc, k, v)
    dq, dk, dv = vjp(o)
    return dq
t = timed_chain(bwd_step, q, k, v, iters=10)
print(f"flash fwd+bwd N=8192: {t*1e3:.3f}ms", flush=True)
print("MEASURE DONE", flush=True)
