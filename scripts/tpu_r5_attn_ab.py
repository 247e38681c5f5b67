"""Round-5: shipped flash fwd vs the headpack probe's simplified kernel.

The r5 headpack probe (scripts/tpu_r5_headpack.py, bench_logs_r5) measured its
simplified single-pass kernel at 1.812 ms / 94.8 TF/s at the ds1 shape
(BH=10, N=8192, D=64) while the r3 probes recorded the SHIPPED kernel at
2.21-2.27 ms / 78-81 TF/s.  The two kernels are structurally identical
(single-pass, K/V resident, blk_q=256, clamped exp, lse write), so either the
r3 number was a harness artifact or some small difference matters.  This
script times BOTH through the *same* chained harness, same inputs, plus
ablations that cover every diff between them:

  shipped      ops/flash_attention._flash_forward (4-D in/out, reshape incl.)
  shipped3d    same pallas_call but fed pre-flattened [BH,N,D] (no reshape)
  probe        the headpack probe kernel verbatim (blk 256)
  probe-blk128 probe kernel at blk_q=128
  probe-nolse  probe kernel without the lse output (inference never reads it)

Decision: if shipped == probe (±3%), r3's 78-81 was harness-side and
CLAUDE.md item 2's attention split shrinks accordingly — no code change.
If shipped is slower, the ablation names the cause and we fix it.
"""
import functools, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

print("backend:", jax.devices()[0].platform, flush=True)

from leftrefill_tpu.ops.flash_attention import _flash_forward
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CLAMP = 75.0


def timed_chain(make_out, a0, iters=60):
    def body(a, _):
        out = make_out(a)
        c = out.reshape(-1)[0].astype(a.dtype)
        return a + c * jnp.asarray(1e-38, a.dtype), None

    loop = jax.jit(lambda a: jax.lax.scan(body, a, None, length=iters)[0])
    drain = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    float(drain(loop(a0)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(drain(loop(a0))); ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def _kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *, scale):
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k.astype(jnp.float32),
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp(jnp.minimum(s, CLAMP))
    l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), jnp.finfo(jnp.float32).tiny)
    o = jax.lax.dot_general(p.astype(v.dtype), v,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)
    if l_ref is not None:
        l_ref[0] = jnp.log(l)


def _kernel_nolse(q_ref, k_ref, v_ref, o_ref, *, scale):
    _kernel(q_ref, k_ref, v_ref, o_ref, None, scale=scale)


def probe_fwd(q, k, v, scale, blk_q=256, lse=True):
    bh, nq, d = q.shape
    nk = k.shape[1]
    out_shape = (jax.ShapeDtypeStruct((bh, nq, d), q.dtype),)
    out_specs = (pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),)
    if lse:
        out_shape += (jax.ShapeDtypeStruct((bh, nq, 1), jnp.float32),)
        out_specs += (pl.BlockSpec((1, blk_q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),)
    kern = functools.partial(_kernel if lse else _kernel_nolse, scale=scale)
    r = pl.pallas_call(
        kern,
        out_shape=out_shape if lse else out_shape[0],
        grid=(bh, nq // blk_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs if lse else out_specs[0],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * nq * nk * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * 2,
            transcendentals=bh * nq * nk,
        ),
    )(q, k, v)
    return r[0] if lse else r


key = jax.random.PRNGKey(0)
z8 = jnp.ones((8, 128), jnp.bfloat16)
floor = timed_chain(lambda a: a + 1.0, z8)
print(f"floor: {floor*1e3:.3f} ms", flush=True)

B, H, N, D = 1, 10, 8192, 64
scale = D ** -0.5
ks = jax.random.split(key, 4)
q4 = jax.random.normal(ks[0], (B, H, N, D), jnp.bfloat16)
k4 = jax.random.normal(ks[1], (B, H, N, D), jnp.bfloat16)
v4 = jax.random.normal(ks[2], (B, H, N, D), jnp.bfloat16)
q3, k3, v3 = (a.reshape(B * H, N, D) for a in (q4, k4, v4))
fl = 4 * B * H * N * N * D

# numerics first: shipped vs probe must agree bitwise-ish
o_ship, _ = jax.jit(lambda q: _flash_forward(q, k4, v4, scale))(q4)
o_probe = jax.jit(lambda q: probe_fwd(q, k3, v3, scale))(q3)
diff = float(jnp.max(jnp.abs(o_ship.reshape(B * H, N, D).astype(jnp.float32) - o_probe.astype(jnp.float32))))
print(f"maxdiff shipped-vs-probe: {diff:.3e}", flush=True)

cells = [
    ("shipped     ", lambda q: _flash_forward(q, k4, v4, scale)[0], q4),
    ("probe       ", lambda q: probe_fwd(q, k3, v3, scale), q3),
    ("probe-blk128", lambda q: probe_fwd(q, k3, v3, scale, blk_q=128), q3),
    ("probe-nolse ", lambda q: probe_fwd(q, k3, v3, scale, lse=False), q3),
]
for name, fn, a0 in cells:
    t = timed_chain(fn, a0) - floor
    print(f"{name}: {t*1e3:.3f} ms ({fl/t/1e12:.1f} TF/s)", flush=True)

# b*h = 20 (the CFG batch-2 inference graph): does the gap persist?
q4b = jnp.concatenate([q4, q4], axis=0)
k4b = jnp.concatenate([k4, k4], axis=0)
v4b = jnp.concatenate([v4, v4], axis=0)
q3b, k3b, v3b = (a.reshape(2 * H, N, D) for a in (q4b, k4b, v4b))
fl2 = 2 * fl
for name, fn, a0 in [
    ("shipped  b2 ", lambda q: _flash_forward(q, k4b, v4b, scale)[0], q4b),
    ("probe    b2 ", lambda q: probe_fwd(q, k3b, v3b, scale), q3b),
]:
    t = timed_chain(fn, a0) - floor
    print(f"{name}: {t*1e3:.3f} ms ({fl2/t/1e12:.1f} TF/s)", flush=True)

print("ATTN AB DONE", flush=True)
