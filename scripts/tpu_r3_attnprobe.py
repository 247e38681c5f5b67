"""Round-3: ds1 self-attention levers.

1. Where does mha's ~1.9ms/call go vs the raw flash kernel (~0.9ms)?
   Time flash direct, the head transposes alone, and mha end-to-end.
2. int8 flash prototype: QK^T as int8 dot (per-row q/k scales, dequant in
   the score epilogue) and optionally PV as int8 (P normalized in-kernel,
   quantized to 1/127 steps; V per-tensor int8).  Checks Mosaic compiles
   in-kernel f32->int8 casts + int8 dots, parity vs the XLA reference, and
   speed vs the bf16 flash kernel.
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
        o = o.reshape(c.shape) if o.size == c.size else jnp.broadcast_to(jnp.sum(o) * 0, c.shape) + c
        return (o * 0.5 + c * 0.5).astype(c.dtype), None

    loop = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=iters)[0])
    drain = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    float(drain(loop(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(drain(loop(x))); ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


z = jnp.ones((8, 128), jnp.bfloat16)
t0 = timed(lambda c: c + 1.0, z)
print(f"floor: {t0*1e3:.3f} ms", flush=True)

B, H, N, D = 2, 5, 8192, 64
C = H * D
scale = D ** -0.5

from leftrefill_tpu.ops.attention import multi_head_attention
from leftrefill_tpu.ops.flash_attention import flash_attention

kq = jax.random.split(jax.random.PRNGKey(0), 3)
qp = jax.random.normal(kq[0], (B, N, C), jnp.bfloat16)
q4 = jax.random.normal(kq[0], (B, H, N, D), jnp.bfloat16)
k4 = jax.random.normal(kq[1], (B, H, N, D), jnp.bfloat16)
v4 = jax.random.normal(kq[2], (B, H, N, D), jnp.bfloat16)

fl = 4 * B * H * N * N * D
t = timed(lambda q: flash_attention(q, k4, v4, scale), q4)
print(f"flash direct [B,H,N,D]: {t*1e3:.3f} ms ({fl/t/1e12:.0f} TF/s)", flush=True)

t = timed(lambda q: multi_head_attention(q, q, q, H), qp)
print(f"mha end-to-end [B,N,C]: {t*1e3:.3f} ms", flush=True)


def transposes_only(q):
    qh = q.reshape(B, N, H, D).transpose(0, 2, 1, 3)
    out = (qh * 1.0).transpose(0, 2, 1, 3).reshape(B, N, C)
    return out

t = timed(transposes_only, qp)
print(f"transpose round-trip x1: {t*1e3:.3f} ms", flush=True)

# ---------------------------------------------------------------------------
# int8 flash prototype
CLAMP = 75.0


def _flash_i8_kernel(q_ref, sq_ref, k_ref, sk_ref, v_ref, o_ref, *, scale, pv_int8):
    q = q_ref[0]                      # [blk, D] int8
    k = k_ref[0]                      # [Nk, D] int8
    v = v_ref[0]                      # [Nk, D] bf16 or int8
    sq = sq_ref[0]                    # [blk, 1] f32
    sk = sk_ref[0]                    # [1, Nk] f32
    s32 = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    s = s32.astype(jnp.float32) * (sq * sk) * scale
    p = jnp.exp(jnp.minimum(s, CLAMP))
    l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), jnp.finfo(jnp.float32).tiny)
    if pv_int8:
        pn = p / l                                     # [blk, Nk] in [0,1]
        pq = jnp.clip(jnp.round(pn * 127.0), 0, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            pq, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        o_ref[0] = (acc.astype(jnp.float32) * (1.0 / 127.0)).astype(o_ref.dtype)
    else:
        o = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0] = (o / l).astype(o_ref.dtype)


def flash_int8(q, k, v, scale, pv_int8=False, blk_q=128):
    b, h, nq, d = q.shape
    nk = k.shape[2]
    qf = q.reshape(b * h, nq, d).astype(jnp.float32)
    kf = k.reshape(b * h, nk, d).astype(jnp.float32)
    vf = v.reshape(b * h, nk, d)
    # per-row symmetric int8
    sq = jnp.maximum(jnp.max(jnp.abs(qf), -1, keepdims=True), 1e-8) / 127.0
    sk = jnp.maximum(jnp.max(jnp.abs(kf), -1, keepdims=True), 1e-8) / 127.0
    qi = jnp.clip(jnp.round(qf / sq), -127, 127).astype(jnp.int8)
    ki = jnp.clip(jnp.round(kf / sk), -127, 127).astype(jnp.int8)
    skr = sk.transpose(0, 2, 1)  # [bh, 1, nk]
    if pv_int8:
        # per-tensor v scale; dequant folded after the dot
        sv = jnp.maximum(jnp.max(jnp.abs(vf.astype(jnp.float32))), 1e-8) / 127.0
        vq = jnp.clip(jnp.round(vf.astype(jnp.float32) / sv), -127, 127).astype(jnp.int8)
        vin, vspec_dtype = vq, jnp.int8
    else:
        vin, vspec_dtype = vf, vf.dtype
    out = pl.pallas_call(
        functools.partial(_flash_i8_kernel, scale=scale, pv_int8=pv_int8),
        out_shape=jax.ShapeDtypeStruct((b * h, nq, d), q.dtype),
        grid=(b * h, nq // blk_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk_q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * nq * nk * d,
            bytes_accessed=qf.size + kf.size + vf.size * 2 + b * h * nq * d * 2,
            transcendentals=b * h * nq * nk,
        ),
    )(qi, sq, ki, skr, vin)
    if pv_int8:
        out = out * sv.astype(out.dtype)
    return out.reshape(b, h, nq, d)


# correctness on a smaller shape first
Bs, Hs, Ns = 1, 2, 512
qs, ks, vs = (jax.random.normal(s, (Bs, Hs, Ns, D), jnp.float32) for s in jax.random.split(jax.random.PRNGKey(7), 3))
from leftrefill_tpu.ops.flash_attention import _xla_reference
ref = np.asarray(_xla_reference(qs, ks, vs, scale))
for pv in (False, True):
    try:
        out = np.asarray(jax.jit(lambda q, k, v: flash_int8(q, k, v, scale, pv_int8=pv))(qs, ks, vs), np.float32)
        err = np.abs(out - ref).max()
        rel = err / np.abs(ref).max()
        print(f"int8 flash pv_int8={pv}: maxerr {err:.4f} rel {rel:.4f}", flush=True)
    except Exception as e:
        print(f"int8 flash pv_int8={pv} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

# timing at ds1
for pv in (False, True):
    try:
        t = timed(lambda q: flash_int8(q, k4, v4, scale, pv_int8=pv), q4)
        print(f"int8 flash ds1 pv_int8={pv}: {t*1e3:.3f} ms ({fl/t/1e12:.0f} TF/s-equiv)", flush=True)
    except Exception as e:
        print(f"int8 flash ds1 pv_int8={pv} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

# smaller levels
for (nn, hh) in [(2048, 10), (512, 20)]:
    qx, kx, vx = (jax.random.normal(s, (2, hh, nn, D), jnp.bfloat16) for s in jax.random.split(jax.random.PRNGKey(9), 3))
    flx = 4 * 2 * hh * nn * nn * D
    t = timed(lambda q: flash_attention(q, kx, vx, scale), qx)
    print(f"bf16 flash N={nn}: {t*1e3:.3f} ms ({flx/t/1e12:.0f} TF/s)", flush=True)
    try:
        t = timed(lambda q: flash_int8(q, kx, vx, scale, pv_int8=True), qx)
        print(f"int8 flash N={nn}: {t*1e3:.3f} ms ({flx/t/1e12:.0f} TF/s-equiv)", flush=True)
    except Exception as e:
        print(f"int8 flash N={nn} FAILED: {str(e)[:200]}", flush=True)

print("ATTNPROBE DONE", flush=True)
