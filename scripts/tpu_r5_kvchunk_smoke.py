"""Smoke + parity + timing of the streaming-K/V flash forward at the V=4
multiview joint-attention shape (b*h=10, N=32768, D=64) — the shape whose
resident-KV plan failed AOT at 32.05M scoped vmem (bench_logs_r5/mv_v4_r5.log).

Parity oracle: full attention over a 256-row q slice (the [256, 32768] score
tile is 32MB in f32 — fine in HBM; the full [N, N] would be 21.5GB).
Timing: chained lax.scan (CLAUDE.md microbenchmark rules)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

print("backend:", jax.devices()[0].platform, flush=True)

from leftrefill_tpu.ops.flash_attention import _flash_forward, _kv_chunk_for

BH, N, D = 10, 32768, 64
SCALE = D**-0.5
# traffic-optimal sizing (blk_q=1024 / chunk=1024) — see _pick_block_kvchunk;
# the original blk128/chunk8192 measured 47.1 TF/s (kvchunk_smoke_r5b.log)
assert _kv_chunk_for(N) == 1024

ks = jax.random.split(jax.random.PRNGKey(0), 3)
q = (jax.random.normal(ks[0], (1, BH, N, D), jnp.float32) * 1.0).astype(jnp.bfloat16)
k = jax.random.normal(ks[1], (1, BH, N, D), jnp.float32).astype(jnp.bfloat16)
v = jax.random.normal(ks[2], (1, BH, N, D), jnp.float32).astype(jnp.bfloat16)


@jax.jit
def fwd(q, k, v):
    o, _ = _flash_forward(q, k, v, SCALE)
    return o


@jax.jit
def ref_slice(q, k, v):
    qs = q[:, :, :256].astype(jnp.float32)
    s = jnp.einsum("bhid,bhjd->bhij", qs, k.astype(jnp.float32)) * SCALE
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhij,bhjd->bhid", p.astype(v.dtype), v)


o = fwd(q, k, v)
print("compiled; out", o.shape, o.dtype, flush=True)
got = np.asarray(o[:, :, :256], np.float32)
want = np.asarray(ref_slice(q, k, v), np.float32)
rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
print(f"slice maxdiff {np.abs(got - want).max():.3e} rel {rel:.3e}", flush=True)
assert rel < 2e-2, rel  # bf16 inputs

ITERS = 20


@jax.jit
def chain(q, k, v):
    def body(c, _):
        o, _ = _flash_forward(c, k, v, SCALE)
        return o.astype(c.dtype), None

    out, _ = jax.lax.scan(body, q, None, length=ITERS)
    return jnp.sum(out.astype(jnp.float32))


float(chain(q, k, v))  # compile+warm
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    float(chain(q, k, v))
    best = min(best, (time.perf_counter() - t0) / ITERS)
flops = 4 * BH * N * N * D
print(f"kvchunk fwd {best*1e3:.2f} ms/iter  {flops/best/1e12:.1f} TF/s", flush=True)
print("KVCHUNK SMOKE DONE", flush=True)
