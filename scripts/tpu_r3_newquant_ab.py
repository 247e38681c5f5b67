"""Round-3 followup: measure the newly-quantized conv sites on the chip.

1. UNet fwd b2 int8 (current dispatch: skip-1x1 + upsample + downsample now
   int8) vs the recorded 29.2 ms.
2. Per-shape stride-2 conv: XLA s8 (LEFTREFILL_INT8_XLA_CONV path) vs the
   dequantized fp conv vs plain bf16 — decides the gate default.
3. Upsample conv shapes through the Pallas int8 kernel vs bf16.

Chained in-graph timing per CLAUDE.md (scan + output->input feedback).
"""
import sys, time

sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

print("backend:", jax.devices()[0].platform, flush=True)

from leftrefill_tpu.ops.quant import (
    conv_int8_xla,
    conv3x3_int8,
    conv3x3_int8_qualifies,
    quantize_weight,
)
from leftrefill_tpu.ops.conv import conv3x3_apply


def timed(fn, x, *rest, iters=60):
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


z = jnp.ones((8, 128), jnp.bfloat16)
print(f"floor: {timed(lambda c: c + 1.0, z)*1e3:.3f} ms", flush=True)

# --- 2/3: conv shape probes ------------------------------------------------
rng = np.random.RandomState(0)
shapes_s2 = [  # (h, w, ch): the three Downsample sites at b2
    (64, 128, 320),
    (32, 64, 640),
    (16, 32, 1280),
]
for h, w, c in shapes_s2:
    x = jnp.asarray(rng.randn(2, h, w, c), jnp.bfloat16)
    wk = jnp.asarray(rng.randn(3, 3, c, c) * 0.05, jnp.float32)
    b = jnp.zeros((c,), jnp.float32)
    wq, ws = quantize_weight(wk)
    wkb = wk.astype(jnp.bfloat16)
    bb = b.astype(jnp.bfloat16)

    def s8(xx):
        y = conv_int8_xla(xx, wq, ws, b, strides=(2, 2))
        return jnp.concatenate([y, y, y, y], 1).reshape(xx.shape) * 1e-3 + xx * 0.999

    def bf(xx):
        y = (
            jax.lax.conv_general_dilated(
                xx, wkb, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + bb
        )
        return jnp.concatenate([y, y, y, y], 1).reshape(xx.shape) * 1e-3 + xx * 0.999

    t8 = timed(s8, x) * 1e3
    tb = timed(bf, x) * 1e3
    print(f"s2 conv {h}x{w}x{c}: xla-s8 {t8:.3f} ms  bf16 {tb:.3f} ms", flush=True)

shapes_up = [  # upsample convs (stride 1) at b2
    (64, 128, 640, 640),
    (32, 64, 1280, 1280),
    (16, 32, 1280, 1280),
]
for h, w, ci, co in shapes_up:
    x = jnp.asarray(rng.randn(2, h, w, ci), jnp.bfloat16)
    wk = jnp.asarray(rng.randn(3, 3, ci, co) * 0.05, jnp.float32)
    b = jnp.zeros((co,), jnp.float32)
    wq, ws = quantize_weight(wk)
    q_ok = conv3x3_int8_qualifies(h, w, ci, co)

    def pal(xx):
        y = conv3x3_int8(xx, wq, ws, b.astype(jnp.bfloat16))
        return y * 1e-3 + xx * 0.999

    def bf(xx):
        y = conv3x3_apply(xx, wk.astype(jnp.bfloat16), b.astype(jnp.bfloat16))
        return y * 1e-3 + xx * 0.999

    def s8x(xx):
        y = conv_int8_xla(xx, wq, ws, b)
        return y * 1e-3 + xx * 0.999

    tp = timed(pal, x) * 1e3 if q_ok else float("nan")
    tb = timed(bf, x) * 1e3
    tx = timed(s8x, x) * 1e3
    print(
        f"up conv {h}x{w} {ci}->{co}: pallas-s8 {tp:.3f} ms (plan={q_ok})  "
        f"bf16 {tb:.3f} ms  xla-s8 {tx:.3f} ms",
        flush=True,
    )

# --- 1: full UNet fwd b2 int8 ----------------------------------------------
import leftrefill_tpu.models.unet as unet_mod
from leftrefill_tpu.ops.quant import quantize_params_like

m = unet_mod.UNetModel(dtype=jnp.bfloat16, quant=True)
xin = jax.random.normal(jax.random.PRNGKey(5), (2, 64, 128, 9), jnp.bfloat16)
tt = jnp.array([500, 500], jnp.int32)
ctx = jax.random.normal(jax.random.PRNGKey(6), (2, 77, 1024), jnp.bfloat16)
shapes = jax.eval_shape(m.init, jax.random.PRNGKey(7), xin, tt, ctx)
params = jax.tree_util.tree_map(
    lambda s: (jnp.ones(s.shape, jnp.float32) * 0.002).astype(s.dtype), shapes
)
params = {"params": quantize_params_like(shapes["params"], params["params"])}


def fwd(c, p, tt, ctx):
    o = m.apply(p, c[..., :9], tt, ctx)
    return jnp.concatenate([o, o, c[..., :1]], axis=-1) * 1e-3 + c * 0.999


t = timed(fwd, xin, params, tt, ctx, iters=40)
print(f"UNet fwd b2 int8 (new dispatch): {t*1e3:.2f} ms", flush=True)
print("NEWQUANT AB DONE", flush=True)
