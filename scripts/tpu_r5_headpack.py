"""Round-5 VERDICT #1: ds1 attention head-packing — decisive probe.

The proposal: pack 2 D=64 heads into one D=128 lane tile so both MXU matmuls
run at full-lane occupancy.  Whether that CAN win is decided by one hardware
question: does a K=64 contraction cost the same MXU cycles as K=128?

Weight-stationary model: matmul [M,K]x[K,N] cycles ~= M * ceil(K/128) *
ceil(N/128).  At K=64 the contraction tile underfills the 128-deep array but
the pass still streams M rows — so t([M,64]x[64,N]) == t([M,128]x[128,N]).
If that holds, the per-head QK^T is ALREADY at the cycle floor: the only
exact 2-head packing is block-diagonal zero-padding ([M,128]x[128,2N]),
whose cycle count 2*M*N/128 equals two unpacked heads exactly — head-packing
is refuted by measurement, not taste.  Same argument lanes-side for PV
([M,N]x[N,64] vs x[N,128]: ceil(64/128)==ceil(128/128)==1 lane tile).

Cells (chained scalar-perturb timing, bf16, best-of-3):
  qk64 : [8192, 64]x[  64,8192]   per-head QK^T shape (ds1: N=8192, D=64)
  qk128: [8192,128]x[ 128,8192]   hypothetical D=128 head, same N
  qkbd : [8192,128]x[ 128,16384]  block-diag 2-head pack (vs 2x qk64)
  pv64 : [8192,8192]x[8192, 64]   per-head PV shape
  pv128: [8192,8192]x[8192,128]
  pvbd : [8192,16384]x[16384,128] block-diag 2-head PV pack (vs 2x pv64)
  noexp: flash fwd kernel with exp->identity (same dots, no VPU exp)
  full : flash fwd kernel as shipped
Decision rule: packing is viable iff qkbd < 1.85 * qk64 or pvbd < 1.85 * pv64
(a >=15% pair win clears chain noise).  Otherwise the refutation is recorded
per-pass and CLAUDE.md 6c closes as a measured negative.

Reference shape source: /root/reference/configs/ref_inpainting.yaml:22-38
(num_heads via dim_head 64), attention.py:236 (the xformers op this replaces).
"""
import functools, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.devices()[0].platform, flush=True)


def timed_chain(make_out, a0, iters=60):
    """Chained timing: out feeds a scalar perturbation of the next input so
    XLA can neither hoist nor DCE the op (CLAUDE.md measurement rules)."""

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


key = jax.random.PRNGKey(0)
z8 = jnp.ones((8, 128), jnp.bfloat16)
floor = timed_chain(lambda a: a + 1.0, z8)
print(f"floor: {floor*1e3:.3f} ms", flush=True)

M, N, D = 8192, 8192, 64
ks = jax.random.split(key, 8)


def cell(name, a_shape, b_shape, flops):
    a = jax.random.normal(ks[0], a_shape, jnp.bfloat16)
    b = jax.random.normal(ks[1], b_shape, jnp.bfloat16)
    t = timed_chain(lambda x: jnp.dot(x, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16), a) - floor
    print(f"{name}: {t*1e3:.3f} ms ({flops/t/1e12:.1f} TF/s useful)", flush=True)
    return t


# QK^T side: contraction-dim underfill question
t_qk64 = cell("qk64 ", (M, D), (D, N), 2 * M * D * N)
t_qk128 = cell("qk128", (M, 2 * D), (2 * D, N), 2 * M * 2 * D * N)
# block-diag pack: one [M,128]x[128,2N] dot = 2 heads' scores exactly
# (weight = blkdiag(k0^T, k1^T)); useful flops = 2 heads' worth
t_qkbd = cell("qkbd ", (M, 2 * D), (2 * D, 2 * N), 2 * (2 * M * D * N))

# PV side: output-lane underfill question
t_pv64 = cell("pv64 ", (M, N), (N, D), 2 * M * N * D)
t_pv128 = cell("pv128", (M, N), (N, 2 * D), 2 * M * N * 2 * D)
t_pvbd = cell("pvbd ", (M, 2 * N), (2 * N, 2 * D), 2 * (2 * M * N * D))

print(f"pack verdict QK: blockdiag {t_qkbd*1e3:.3f} vs 2x single {2*t_qk64*1e3:.3f} ms "
      f"-> {'WIN' if t_qkbd < 1.85 * t_qk64 else 'NO WIN'}", flush=True)
print(f"pack verdict PV: blockdiag {t_pvbd*1e3:.3f} vs 2x single {2*t_pv64*1e3:.3f} ms "
      f"-> {'WIN' if t_pvbd < 1.85 * t_pv64 else 'NO WIN'}", flush=True)

# ---------------------------------------------------------------------------
# exp share of the shipped forward kernel: identical kernel, exp -> identity.
# (Wrong math, identical dot/memory pattern — a pure VPU-share measurement.)
CLAMP = 75.0


def _kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *, scale, use_exp):
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k.astype(jnp.float32),
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp(jnp.minimum(s, CLAMP)) if use_exp else jnp.minimum(s, CLAMP)
    l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), jnp.finfo(jnp.float32).tiny)
    o = jax.lax.dot_general(p.astype(v.dtype), v,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)
    l_ref[0] = jnp.log(l)


def fwd(q, k, v, scale, use_exp, blk_q=256):
    bh, nq, d = q.shape
    nk = k.shape[1]
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, use_exp=use_exp),
        out_shape=(jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
                   jax.ShapeDtypeStruct((bh, nq, 1), jnp.float32)),
        grid=(bh, nq // blk_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * nq * nk * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * 2,
            transcendentals=bh * nq * nk if use_exp else 0,
        ),
    )(q, k, v)[0]


BH = 10
scale = D ** -0.5
q3 = jax.random.normal(ks[2], (BH, N, D), jnp.bfloat16)
k3 = jax.random.normal(ks[3], (BH, N, D), jnp.bfloat16)
v3 = jax.random.normal(ks[4], (BH, N, D), jnp.bfloat16)
fl = 4 * BH * N * N * D
for use_exp, name in ((True, "full "), (False, "noexp")):
    t = timed_chain(lambda q: fwd(q, k3, v3, scale, use_exp), q3) - floor
    print(f"flash fwd {name} (BH={BH},N={N},D={D}): {t*1e3:.3f} ms ({fl/t/1e12:.1f} TF/s)", flush=True)

print("HEADPACK PROBE DONE", flush=True)
