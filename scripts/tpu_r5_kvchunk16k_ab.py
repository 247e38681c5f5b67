"""Resident vs streaming flash forward at the V=2 multiview joint-attention
shape (b*h=10, N=16384, D=64).

The resident picker drops to blk_q=64 at nk=16384 (score tile 4MB beside the
8MB double-buffered resident K/V), i.e. 256 tiny q-steps; the streaming
kernel at the swept (blk_q=2048, chunk=1024) sizing measured 89.4 TF/s at
N=32768.  If streaming wins here too, KV_RESIDENT_MAX drops to 8192 and the
V=2 multiview e2e (0.66 scenes/s headline) gets the win.  Chained lax.scan
timing per CLAUDE.md rules."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

print("backend:", jax.devices()[0].platform, flush=True)

import leftrefill_tpu.ops.flash_attention as fa

BH, N, D = 10, 16384, 64
SCALE = D**-0.5
ITERS = 20

ks = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(ks[0], (1, BH, N, D), jnp.float32).astype(jnp.bfloat16)
k = jax.random.normal(ks[1], (1, BH, N, D), jnp.float32).astype(jnp.bfloat16)
v = jax.random.normal(ks[2], (1, BH, N, D), jnp.float32).astype(jnp.bfloat16)
flops = 4 * BH * N * N * D

outs = {}
for arm, resident_max in [("streaming", 8192), ("resident", 16384)]:
    fa.KV_RESIDENT_MAX = resident_max
    fwd = jax.jit(lambda q, k, v: fa._flash_forward(q, k, v, SCALE)[0])
    try:
        o = fwd(q, k, v)
    except Exception as e:
        # the resident blk64 plan at nk=16384 is 16.06M scoped vmem on paper
        # (64K over) — it compiled inside the r4 e2e graphs but can fail AOT
        # standalone; a failure here is itself a result.
        print(f"{arm}: FAILED {str(e).splitlines()[0][:140]}", flush=True)
        continue
    outs[arm] = np.asarray(o[:, :, :256], np.float32)

    @jax.jit
    def chain(q, k, v):
        def body(c, _):
            return fwd(c, k, v).astype(c.dtype), None
        out, _ = jax.lax.scan(body, q, None, length=ITERS)
        return jnp.sum(out.astype(jnp.float32))

    float(chain(q, k, v))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(q, k, v))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"{arm}: {best*1e3:.2f} ms  {flops/best/1e12:.1f} TF/s", flush=True)

if len(outs) == 2:
    d = np.abs(outs["resident"] - outs["streaming"]).max()
    print(f"arm maxdiff {d:.3e}", flush=True)
print("KVCHUNK16K AB DONE", flush=True)
