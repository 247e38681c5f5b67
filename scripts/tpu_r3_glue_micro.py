"""Round-3: bottom-up accounting of the UNet "glue" time at real step shapes.

The split (tpu_r3_split2/3, CLAUDE.md) says UNet fwd b2 int8 ~29.2 ms =
attention math 11.3 + FF 3.9 + "rest" ~13.4, of which isolated conv kernels
are only ~3.4.  This script times every suspect glue op at its real shape so
the residual can be attributed instead of guessed:

  1. int8 XLA dot TOPS vs contraction depth K (is K=320 deep enough for the
     2x int8 MXU rate, or would deep-K im2col restructuring pay?)
  2. quantize_activation at the hot activation shapes
  3. conv3x3_int8 full (quant+copies+kernel) vs _pre (copies+kernel)
  4. decoder skip-concat cost in situ: conv(cat(a,b)) vs conv(precat)
  5. up/down resampling, GroupNorm32 / LayerNorm fp32-island passes
  6. int8 1x1/dense sites incl. their rowwise quantize

All loops chain real data dependence (output feeds the next input, rebuilt
to the input's shape/dtype) so XLA cannot hoist or DCE the op under test —
the scalar-*0 trick is NOT safe (constant-folding drops the op).
"""
import sys, time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.devices()[0].platform, flush=True)

from leftrefill_tpu.ops import quant as Q
from leftrefill_tpu.ops.layers import group_norm32


def timed(fn, x, *rest, iters=100):
    """fn(c, *rest) -> next c (same shape/dtype).  Chained scan, bo3."""

    def body(c, _):
        return fn(c, *rest), None

    loop = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=iters)[0])
    drain = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    float(drain(loop(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(drain(loop(x)))
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def rebuild(o, ci, dtype=jnp.bfloat16, lim=3.0):
    """Map a conv/dot output back to an input of channel count ci."""
    oc = o.shape[-1]
    reps = -(-ci // oc)
    nxt = jnp.concatenate([o] * reps, axis=-1)[..., :ci] if reps > 1 else o[..., :ci]
    nxt = jnp.clip(nxt.astype(jnp.float32) * 0.1, -lim, lim)
    return jnp.round(nxt).astype(dtype) if dtype == jnp.int8 else nxt.astype(dtype)


z = jnp.ones((8, 128), jnp.bfloat16)
floor = timed(lambda c: c + 1.0, z)
print(f"floor: {floor*1e3:.4f} ms", flush=True)

# --- 1. int8 dot rate vs K (M=16384 rows ~ b2 ds1 pixels, N=320) ----------
# feedback: full reduce of o (forces the whole dot; one 21MB int32 read,
# constant across K — compare TOPS *differences* across K, not absolutes)
print("\n# int8 XLA dot TOPS vs K  (M=16384, N=320; sum-feedback)", flush=True)
for K in (128, 320, 640, 960, 1920, 2880):
    a = jnp.ones((16384, K), jnp.int8)
    b = jnp.ones((K, 320), jnp.int8)

    def dot2(c, b):
        o = jax.lax.dot_general(
            c, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        p = (jnp.sum(o, dtype=jnp.int32) % 2).astype(jnp.int8)
        return c + p

    t = timed(dot2, a, b) - floor
    tops = 2 * 16384 * K * 320 / t / 1e12
    print(f"  K={K:5d}: {t*1e3:.4f} ms  {tops:6.1f} TOPS", flush=True)

a = jnp.ones((16384, 320), jnp.bfloat16)
b = jnp.ones((320, 320), jnp.bfloat16)


def dotb(c, b):
    o = c @ b
    return c + (jnp.sum(o.astype(jnp.float32)) % 2).astype(c.dtype) * 1e-6


t = timed(dotb, a, b) - floor
print(f"  bf16 K=320: {t*1e3:.4f} ms  {2*16384*320*320/t/1e12:6.1f} TF/s", flush=True)

# --- 2. quantize passes (quantize + dequant-cast feedback) ------------------
print("\n# quantize_activation at hot shapes (incl. dequant feedback pass)", flush=True)
for shape in ((2, 64, 128, 320), (2, 64, 128, 640), (2, 64, 128, 960),
              (2, 32, 64, 640), (2, 16, 32, 1280), (16384, 320)):
    x = jnp.ones(shape, jnp.bfloat16)

    def qa(c):
        xq, s = Q.quantize_activation(c)
        return (xq.astype(jnp.float32) * s).astype(jnp.bfloat16)

    t = timed(qa, x) - floor
    mb = np.prod(shape) * 2 / 1e6
    print(f"  {str(shape):22s}: {t*1e3:.4f} ms  ({mb:.1f} MB bf16 in)", flush=True)

x = jnp.ones((16384, 320), jnp.bfloat16)


def qr(c):
    xq, s = Q.quantize_activation_rowwise(c)
    return (xq.astype(jnp.float32) * s).astype(jnp.bfloat16)


t = timed(qr, x) - floor
print(f"  rowwise (16384,320)   : {t*1e3:.4f} ms", flush=True)

# --- 3. conv full vs pre (prologue split) ----------------------------------
print("\n# int8 conv: full (quant+copies+kernel) vs _pre (copies+kernel)", flush=True)
for (h, w, ci, co) in ((64, 128, 320, 320), (64, 128, 640, 320),
                       (64, 128, 960, 320), (32, 64, 640, 640),
                       (16, 32, 1280, 1280)):
    kw = jnp.ones((3, 3, ci, co), jnp.int8)
    ws = jnp.full((co,), 1e-3, jnp.float32)
    bias = jnp.zeros((co,), jnp.float32)
    x = jnp.ones((2, h, w, ci), jnp.bfloat16)
    xq = jnp.ones((2, h, w, ci), jnp.int8)
    sx = jnp.float32(1e-2)

    def full(c, kw, ws, bias):
        o = Q.conv3x3_int8(c, kw, ws, bias)
        return rebuild(o, ci)

    def pre(c, kw, ws, bias):
        o = Q.conv3x3_int8_copy3_pre(c, sx, kw, ws, bias)
        return rebuild(o, ci, dtype=jnp.int8)

    tf = timed(full, x, kw, ws, bias) - floor
    tp = timed(pre, xq, kw, ws, bias) - floor
    gf = 2 * 9 * 2 * h * w * ci * co / 1e9
    print(
        f"  {h}x{w} {ci:4d}->{co:4d}: full {tf*1e3:.4f} ms ({gf/tf/1e3:5.1f} TOPS)"
        f"  pre {tp*1e3:.4f} ms ({gf/tp/1e3:5.1f} TOPS)  quant+fb {1e3*(tf-tp):.4f} ms",
        flush=True,
    )

# --- 4. decoder skip-concat in situ: conv(cat(a,b)) vs conv(precat) --------
print("\n# skip concat in situ (conv of cat vs conv of pre-catted)", flush=True)
for (h, w, c1, c2) in ((64, 128, 320, 320), (64, 128, 640, 320),
                       (32, 64, 640, 640), (16, 32, 1280, 1280)):
    ci = c1 + c2
    co = c1
    kw = jnp.ones((3, 3, ci, co), jnp.int8)
    ws = jnp.full((co,), 1e-3, jnp.float32)
    bias = jnp.zeros((co,), jnp.float32)
    a0 = jnp.ones((2, h, w, c1), jnp.bfloat16)
    skip = jnp.ones((2, h, w, c2), jnp.bfloat16)
    xc = jnp.ones((2, h, w, ci), jnp.bfloat16)

    def withcat(c, skip, kw, ws, bias):
        o = Q.conv3x3_int8(jnp.concatenate([c, skip], axis=-1), kw, ws, bias)
        return rebuild(o, c1)

    def precat(c, kw, ws, bias):
        o = Q.conv3x3_int8(c, kw, ws, bias)
        return rebuild(o, ci)

    t1 = timed(withcat, a0, skip, kw, ws, bias) - floor
    t2 = timed(precat, xc, kw, ws, bias) - floor
    print(
        f"  {h}x{w} {c1}+{c2}: cat+conv {t1*1e3:.4f} ms  precat {t2*1e3:.4f} ms"
        f"  cat-cost {1e3*(t1-t2):+.4f} ms",
        flush=True,
    )

# --- 5. resampling + norm passes --------------------------------------------
print("\n# up+pool chains and norm passes", flush=True)
from leftrefill_tpu.models.unet import avg_pool_2x, nearest_upsample_2x

for (h, w, c) in ((32, 64, 640), (16, 32, 1280), (8, 16, 1280)):
    x = jnp.ones((2, h, w, c), jnp.bfloat16)

    def updown(cc):
        return avg_pool_2x(nearest_upsample_2x(cc)) * 0.999

    t = timed(updown, x) - floor
    print(f"  up2x+pool2x {h}x{w}x{c}: {t*1e3:.4f} ms (pair)", flush=True)

for (h, w, c) in ((64, 128, 320), (64, 128, 640), (32, 64, 640), (16, 32, 1280)):
    x = jnp.ones((2, h, w, c), jnp.bfloat16)
    g = jnp.ones((c,), jnp.float32)
    bta = jnp.zeros((c,), jnp.float32)

    def gn(cc, g, bta):
        return group_norm32(cc, g, bta, num_groups=32, eps=1e-5)

    t = timed(gn, x, g, bta) - floor
    print(f"  GN32 {h}x{w}x{c}: {t*1e3:.4f} ms", flush=True)

x = jnp.ones((2, 8192, 320), jnp.bfloat16)
g = jnp.ones((320,), jnp.float32)
bta = jnp.zeros((320,), jnp.float32)


def ln(c, g, bta):
    xf = c.astype(jnp.float32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    v = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - m) * jax.lax.rsqrt(v + 1e-5) * g + bta).astype(c.dtype)


t = timed(ln, x, g, bta) - floor
print(f"  LN [2,8192,320]: {t*1e3:.4f} ms", flush=True)

# --- 6. int8 1x1 (dense) sites incl rowwise quantize ------------------------
print("\n# int8 1x1/dense sites (rowwise quant + dot)", flush=True)
for (rows, ci, co) in ((16384, 320, 320), (16384, 640, 320), (4096, 640, 640),
                       (16384, 320, 960)):
    x = jnp.ones((rows, ci), jnp.bfloat16)
    wq = jnp.ones((ci, co), jnp.int8)
    ws = jnp.full((co,), 1e-3, jnp.float32)

    def d8(c, wq, ws):
        xq, s = Q.quantize_activation_rowwise(c)
        o = Q.dense_int8(xq, s, wq, ws)
        return rebuild(o, ci)

    t = timed(d8, x, wq, ws) - floor
    print(f"  {rows}x{ci}->{co}: {t*1e3:.4f} ms", flush=True)

print("\nGLUE MICRO DONE", flush=True)
