"""(blk_q, kv_chunk) sizing sweep for the streaming-K/V flash forward at the
V=4 multiview shape (b*h=10, N=32768, D=64).

Shipped sizing (1024, 1024) measured 86.5 TF/s (kvchunk_smoke2_r5c.log) vs
the 96.8 TF/s resident record.  K/V DMA per grid step is ~256KB (~0.3us,
trivially hidden), so the residual gap is per-grid-step fixed overhead —
the grid has 10*32*32 = 10240 steps at ~31us each.  Bigger tiles mean fewer
steps: (1024, 2048) and (2048, 1024) put the fp32 score tile at 8MB (may or
may not clear the 16M scoped-vmem limit after Mosaic's ~1.45x — AOT failure
is caught per config and reported, not fatal).  Timing: chained lax.scan per
CLAUDE.md microbenchmark rules.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

print("backend:", jax.devices()[0].platform, flush=True)

import leftrefill_tpu.ops.flash_attention as fa

BH, N, D = 10, 32768, 64
SCALE = D**-0.5
ITERS = 20

ks = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(ks[0], (1, BH, N, D), jnp.float32).astype(jnp.bfloat16)
k = jax.random.normal(ks[1], (1, BH, N, D), jnp.float32).astype(jnp.bfloat16)
v = jax.random.normal(ks[2], (1, BH, N, D), jnp.float32).astype(jnp.bfloat16)

# fp32 oracle on a 256-row q slice (full [N,N] would be 21.5GB)
@jax.jit
def ref_slice(q, k, v):
    qs = q[:, :, :256].astype(jnp.float32)
    s = jnp.einsum("bhid,bhjd->bhij", qs, k.astype(jnp.float32)) * SCALE
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", p.astype(v.dtype), v)

want = np.asarray(ref_slice(q, k, v), np.float32)
flops = 4 * BH * N * N * D

for blk_q, chunk in [(1024, 1024), (1024, 2048), (2048, 1024), (512, 2048)]:
    fa.KV_CHUNK = chunk
    fa._pick_block_kvchunk = lambda nq, c, _b=blk_q: _b
    try:
        fwd = jax.jit(lambda q, k, v: fa._flash_forward(q, k, v, SCALE)[0])
        o = fwd(q, k, v)
        got = np.asarray(o[:, :, :256], np.float32)
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 2e-2, rel

        @jax.jit
        def chain(q, k, v):
            def body(c, _):
                o = fwd(c, k, v)
                return o.astype(c.dtype), None
            out, _ = jax.lax.scan(body, q, None, length=ITERS)
            return jnp.sum(out.astype(jnp.float32))

        float(chain(q, k, v))  # compile+warm
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(q, k, v))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        print(f"blk_q={blk_q} chunk={chunk}: {best*1e3:.2f} ms  {flops/best/1e12:.1f} TF/s", flush=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:160] if str(e) else type(e).__name__
        print(f"blk_q={blk_q} chunk={chunk}: FAILED {msg}", flush=True)

print("KVCHUNK SWEEP DONE", flush=True)
