"""Streaming-dq block-size A/B at the V=4 multiview joint-attention shape
(b*h=10, N=32768, D=64): blk_q=128 (the resident-derived sizing the chunked
path first shipped with) vs blk_q=512 (four fp32 [blk_q, 1024] tiles = 8MB;
4x less K/V re-streaming — the same traffic math that took the forward from
47 to 89 TF/s).  Times the full VJP (dq + dkv); the dkv kernel is identical
in both arms, so the delta is the dq change.  Chained lax.scan timing."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

print("backend:", jax.devices()[0].platform, flush=True)

import leftrefill_tpu.ops.flash_attention as fa

BH, N, D = 10, 32768, 64
SCALE = D**-0.5
ITERS = 10

ks = jax.random.split(jax.random.PRNGKey(0), 4)
q = jax.random.normal(ks[0], (1, BH, N, D), jnp.float32).astype(jnp.bfloat16)
k = jax.random.normal(ks[1], (1, BH, N, D), jnp.float32).astype(jnp.bfloat16)
v = jax.random.normal(ks[2], (1, BH, N, D), jnp.float32).astype(jnp.bfloat16)

outs = {}
for blk in (128, 512):
    fa._pick_block_bwd_chunk = lambda nq, _b=blk: _b

    def vjp_q(qc):
        _, vjp = jax.vjp(lambda a: fa.flash_attention(a, k, v, SCALE), qc)
        (dq,) = vjp(jnp.ones_like(qc))
        return dq

    @jax.jit
    def chain(q):
        def body(c, _):
            return vjp_q(c).astype(c.dtype), None
        out, _ = jax.lax.scan(body, q, None, length=ITERS)
        return jnp.sum(out.astype(jnp.float32))

    s = float(chain(q))
    outs[blk] = s
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(q))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    # fwd (flash recompute is not in this vjp; dq = 6N^2D-ish per FlashVJP
    # convention: 2 matmuls in dq + recompute matmul) — report raw ms
    print(f"dq blk_q={blk}: {best*1e3:.2f} ms/iter (sum={s:.3f})", flush=True)

print("DQCHUNK AB DONE", flush=True)
