"""Round-3: the ds1 flash kernel is ~78 TF/s and looks VPU(softmax)-bound
(int8 QK^T made it SLOWER).  Probe cheaper-softmax variants:

  a. baseline (fp32 exp, clamp)           [current production kernel]
  b. no-clamp (measure the min's cost)
  c. bf16 exp (cast scores to bf16 before exp; row-sum still fp32)
  d. bf16 exp + blk_q=256
  e. fp32 exp but scores computed to bf16 PV directly without /l fold... (skip)

Each timed at the ds1 shape (2,5,8192,64) and parity-checked vs fp32 ref.
"""
import functools, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.devices()[0].platform, flush=True)


def timed(fn, *args, iters=100):
    x = args[0]

    def body(c, _):
        o = fn(c, *args[1:])
        return (o * 0.5 + c * 0.5).astype(c.dtype), None

    loop = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=iters)[0])
    drain = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    float(drain(loop(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(drain(loop(x))); ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


CLAMP = 75.0


def make_kernel(exp_bf16, clamp):
    def kern(q_ref, k_ref, v_ref, o_ref, *, scale):
        q = q_ref[0].astype(jnp.float32) * scale
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if clamp:
            s = jnp.minimum(s, CLAMP)
        if exp_bf16:
            p = jnp.exp(s.astype(jnp.bfloat16))
            l = jnp.maximum(
                jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True),
                jnp.finfo(jnp.float32).tiny,
            )
        else:
            p = jnp.exp(s)
            l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), jnp.finfo(jnp.float32).tiny)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = (o / l).astype(o_ref.dtype)

    return kern


def flash_var(q, k, v, scale, exp_bf16=False, clamp=True, blk_q=128):
    b, h, nq, d = q.shape
    nk = k.shape[2]
    qf, kf, vf = (a.reshape(b * h, -1, d) for a in (q, k, v))
    return pl.pallas_call(
        functools.partial(make_kernel(exp_bf16, clamp), scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, nq, d), q.dtype),
        grid=(b * h, nq // blk_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nq * nk * d,
            bytes_accessed=(qf.size + kf.size + vf.size * 2) * 2,
            transcendentals=b * h * nq * nk,
        ),
    )(qf, kf, vf).reshape(b, h, nq, d)


from leftrefill_tpu.ops.flash_attention import _xla_reference

B, H, N, D = 2, 5, 8192, 64
scale = D ** -0.5
ks = jax.random.split(jax.random.PRNGKey(0), 3)
q4, k4, v4 = (jax.random.normal(s, (B, H, N, D), jnp.bfloat16) for s in ks)

# parity at a smaller shape (fp32 inputs so the reference is meaningful)
qs, ksm, vs = (jax.random.normal(s, (1, 2, 512, D), jnp.float32) for s in jax.random.split(jax.random.PRNGKey(7), 3))
ref = np.asarray(_xla_reference(qs, ksm, vs, scale))
fl = 4 * B * H * N * N * D

variants = [
    ("fp32exp+clamp (baseline)", dict(exp_bf16=False, clamp=True, blk_q=128)),
    ("fp32exp no-clamp", dict(exp_bf16=False, clamp=False, blk_q=128)),
    ("bf16exp+clamp", dict(exp_bf16=True, clamp=True, blk_q=128)),
    ("bf16exp+clamp blk256", dict(exp_bf16=True, clamp=True, blk_q=256)),
    ("fp32exp+clamp blk256", dict(exp_bf16=False, clamp=True, blk_q=256)),
    ("bf16exp+clamp blk512", dict(exp_bf16=True, clamp=True, blk_q=512)),
]
for name, kw in variants:
    try:
        out = np.asarray(jax.jit(lambda q, k, v: flash_var(q, k, v, scale, **kw))(qs, ksm, vs), np.float32)
        rel = np.abs(out - ref).max() / np.abs(ref).max()
        t = timed(lambda q: flash_var(q, k4, v4, scale, **kw), q4)
        print(f"{name}: {t*1e3:.3f} ms ({fl/t/1e12:.0f} TF/s)  rel_err={rel:.5f}", flush=True)
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)

print("ATTNPROBE2 DONE", flush=True)
