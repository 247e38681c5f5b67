"""Round-3: account for the ~10ms of non-kernel time in the int8 conv path.

Chains K identical ops inside one jit (scan) so the measured per-op cost is
on-device (not host dispatch).  Then times one L0 ResBlock end-to-end vs the
sum of its parts, and the full UNet fwd with the new 8x16 int8 dispatch.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import flax.linen as nn

print("backend:", jax.devices()[0].platform, flush=True)


def timed(fn, x, *rest, iters=100):
    def body(c, _):
        o = fn(c, *rest)
        return o.astype(c.dtype) if o.shape == x.shape else (
            jnp.broadcast_to(jnp.mean(o).astype(c.dtype) * 1e-6 + 1.0, c.shape) * c
        ), None
    loop = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=iters)[0])
    drain = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    float(drain(loop(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(drain(loop(x))); ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


B, H, W, C = 2, 64, 128, 320
x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)

# floor
z = jnp.ones((8, 128), jnp.bfloat16)
t0 = timed(lambda c: c + 1.0, z)
print(f"floor (tiny add): {t0*1e3:.3f} ms", flush=True)

# 1. GN32 (fast_affine) + silu at L0
from leftrefill_tpu.ops.layers import GroupNorm32
gn = GroupNorm32(32)
gnp = gn.init(jax.random.PRNGKey(1), x)
t = timed(lambda c: nn.silu(gn.apply(gnp, c)), x)
print(f"GN32+silu L0 (fast_affine): {t*1e3:.3f} ms", flush=True)
gn_slow = GroupNorm32(32, fast_affine=False)
t = timed(lambda c: nn.silu(gn_slow.apply(gnp, c)), x)
print(f"GN32+silu L0 (fp32 affine): {t*1e3:.3f} ms", flush=True)

# 2. quantize_activation at L0
from leftrefill_tpu.ops.quant import quantize_activation
def qa(c):
    xq, s = quantize_activation(c)
    return xq.astype(jnp.bfloat16) * s
t = timed(qa, x)
print(f"quantize+dequant L0: {t*1e3:.3f} ms", flush=True)

# 3. pallas launch overhead: minimal kernel on a tiny tile
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
def _noop_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0
def noop(c):
    return pl.pallas_call(
        _noop_kernel,
        out_shape=jax.ShapeDtypeStruct(c.shape, c.dtype),
    )(c)
t = timed(noop, z)
print(f"pallas launch (tiny kernel): {t*1e3:.3f} ms", flush=True)

# 4. one L0 int8 ResBlock end-to-end vs parts
from leftrefill_tpu.models.unet import ResBlock
from leftrefill_tpu.ops.quant import quantize_params_like, conv3x3_int8, quantize_weight
emb = jax.random.normal(jax.random.PRNGKey(2), (B, 1280), jnp.bfloat16)
rb = ResBlock(out_channels=C, dtype=jnp.bfloat16, quant=True)
q_struct = jax.eval_shape(rb.init, jax.random.PRNGKey(3), x, emb)["params"]
rb_fp = ResBlock(out_channels=C, dtype=jnp.bfloat16, quant=False)
fp_params = rb_fp.init(jax.random.PRNGKey(3), x, emb)["params"]
qp = quantize_params_like(q_struct, fp_params)
t_rb = timed(lambda c: rb.apply({"params": qp}, c, emb), x)
print(f"ResBlock L0 int8 end-to-end: {t_rb*1e3:.3f} ms", flush=True)
t_rb_fp = timed(lambda c: rb_fp.apply({"params": fp_params}, c, emb), x)
print(f"ResBlock L0 bf16 end-to-end: {t_rb_fp*1e3:.3f} ms", flush=True)

wt = jax.random.normal(jax.random.PRNGKey(4), (3, 3, C, C), jnp.float32) * 0.05
wq, ws = quantize_weight(wt)
bias = jnp.zeros((C,), jnp.float32)
t_conv = timed(lambda c: conv3x3_int8(c, wq, ws, bias), x)
print(f"conv3x3_int8 L0 isolated (incl quant): {t_conv*1e3:.3f} ms", flush=True)

# 5. full UNet int8 fwd b2 with the new dispatch (8x16 now int8)
from leftrefill_tpu.models.unet import UNetModel
for quant in (True, False):
    m = UNetModel(dtype=jnp.bfloat16, quant=quant)
    xin = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 128, 9), jnp.bfloat16)
    tt = jnp.array([500, 500], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(6), (2, 77, 1024), jnp.bfloat16)
    shapes = jax.eval_shape(m.init, jax.random.PRNGKey(7), xin, tt, ctx)
    params = jax.tree_util.tree_map(
        lambda s: (jnp.ones(s.shape, jnp.float32) * 0.002).astype(s.dtype), shapes
    )
    if quant:
        params = {"params": quantize_params_like(shapes["params"], params["params"])}
    def fwd(c, p, tt, ctx):
        o = m.apply(p, c[..., :9], tt, ctx)
        return jnp.concatenate([o, o, c[..., :1]], axis=-1) * 1e-3
    t = timed(fwd, xin, params, tt, ctx, iters=30)
    print(f"full UNet fwd b2 {'int8' if quant else 'bf16'}: {t*1e3:.2f} ms", flush=True)

print("OVERHEAD DONE", flush=True)
