"""dk/dv k-block A/B: the dkv kernel re-streams Q/dO once per k block
(grid = (b*h, nk/blk_k, nq/chunk)), so blk_k=128 makes 256 full passes over
Q/dO at nk=32768 (64 at the 1-ref train shape nk=8192).  Larger blk_k cuts
that linearly while the p tiles ([512, blk_k] fp32) stay small (1MB at 512).

Arms: blk_k in {128, 256, 512} x two shapes:
  - V=4 multiview train (b*h=10, N=32768)
  - 1-ref train ds1 (b*h=40, N=8192 — the B=8 train step's CFG-free shape)
Times the full attention VJP via grad wrt (k, v) chained through q->q;
the dq kernel is identical in all arms, so deltas isolate dkv."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

print("backend:", jax.devices()[0].platform, flush=True)

import leftrefill_tpu.ops.flash_attention as fa

ITERS = 10
for BH, N in [(10, 32768), (40, 8192)]:
    SCALE = 64**-0.5
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (1, BH, N, 64), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (1, BH, N, 64), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (1, BH, N, 64), jnp.float32).astype(jnp.bfloat16)
    for blk in (128, 256, 512):
        fa.DKV_BLOCK_K = blk

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

        try:
            s = float(chain(q))
        except Exception as e:
            print(f"bh={BH} N={N} blk_k={blk}: FAILED {str(e).splitlines()[0][:120]}", flush=True)
            continue
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(chain(q))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        print(f"bh={BH} N={N} blk_k={blk}: {best*1e3:.2f} ms/iter (sum={s:.3f})", flush=True)

print("DKV AB DONE", flush=True)
