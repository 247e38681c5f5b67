"""Round-3: A/B the log2-domain softmax (LEFTREFILL_FLASH_EXP2) in the
production flash kernel at the ds1 shape.

Hypothesis: the VPU's exp is microcoded as exp2(x*log2e); prescaling q by
scale*log2e and calling exp2 directly deletes one full [blk, N] multiply
pass per score tile.  The exp passes are ~30% of the 78-81 TF/s kernel, so
the ceiling on this trick is a few TF/s — chained timing only.

Times the REAL production kernel (ops/flash_attention.flash_attention) via
set_exp2(), fwd and fwd+bwd, plus on-chip parity exp2-vs-default.
"""
import sys, time

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

print("backend:", jax.devices()[0].platform, flush=True)

from leftrefill_tpu.ops import flash_attention as fa

B, H, N, D = 2, 5, 8192, 64
scale = D**-0.5
ks = jax.random.split(jax.random.PRNGKey(0), 3)
q, k, v = (jax.random.normal(s, (B, H, N, D), jnp.bfloat16) for s in ks)
fl_fwd = 4 * B * H * N * N * D


def timed(fn, x, iters=60):
    def body(c, _):
        o = fn(c)
        return (o * 0.5 + c * 0.5).astype(c.dtype), None

    loop = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=iters)[0])
    drain = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    float(drain(loop(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(drain(loop(x)))
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def fwd(qq):
    return fa.flash_attention(qq, k, v, scale)


def fwdbwd(qq):
    return jax.grad(lambda a: jnp.sum(fa.flash_attention(a, k, v, scale).astype(jnp.float32) ** 2))(qq)


outs = {}
for mode in (False, True):
    fa.set_exp2(mode)
    name = "exp2" if mode else "exp"
    try:
        outs[name] = np.asarray(jax.jit(fwd)(q), np.float32)
        tf = timed(fwd, q)
        tb = timed(fwdbwd, q, iters=30)
        print(
            f"{name}: fwd {tf*1e3:.3f} ms ({fl_fwd/tf/1e12:.1f} TF/s)  "
            f"fwd+bwd {tb*1e3:.3f} ms",
            flush=True,
        )
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)
fa.set_exp2(False)

if len(outs) == 2:
    d = np.abs(outs["exp"] - outs["exp2"]).max()
    rel = d / max(np.abs(outs["exp"]).max(), 1e-9)
    print(f"on-chip parity exp vs exp2: maxdiff {d:.6f} rel {rel:.6f}", flush=True)
print("EXP2 AB DONE", flush=True)
