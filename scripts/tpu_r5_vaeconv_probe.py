"""Round-5: can the Pallas bf16 conv beat XLA's conv at the VAE's shapes?

Motivation: VAE decode is ~69 ms/canvas — at dpm++2m@15 that is ~15% of the
headline canvas time — and runs entirely on XLA convs at ~31% MXU util
(decoder ~5 TFLOP vs 69 ms).  The UNet's Pallas bf16 conv measured a win at
latent shapes in r2 (bench 0.469 vs 0.437), but the VAE's big-spatial shapes
never had VMEM plans: the kernel keeps full H resident and the width menu
stopped at 16.

Two extensions probed here, both dispatch-level (NO kernel change):
  - width-8 blocks (the sublane minimum): gives direct plans at 256x512
  - h-slab decomposition for 512x1024: conv3x3_op on overlapping row-slabs
    (SAME-pad garbage rows at the seam are dropped) — each slab plans at
    h<=258

Cells (chained scalar-perturb timing, bf16, best-of-3) at the heaviest
decoder shapes, XLA vs Pallas:
  64x128x512->512, 128x256x512->512, 256x512x512->512, 256x512x256->256,
  512x1024x256->256, 512x1024x128->128

Decision: Pallas wins a shape class by >=10% -> wire the VAE conv dispatch
(models/autoencoder._conv) onto conv3x3_apply with the extended plans and
A/B the full decode + e2e in the chain; else record the negative.
"""
import sys
sys.exit("OBSOLETE (r5): the gated dispatcher it drove (ops/conv.conv3x3_apply_vae / _wide_plan) was DELETED in r5 after the clean e2e A/B lost (-6.8%, bench_logs_r5/bench_vaeconv_clean_r5b.log). This script is kept as the historical record of how the measurement was made; restore the deleted code from git history to re-run it.")
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

print("backend:", jax.devices()[0].platform, flush=True)

from leftrefill_tpu.ops.conv import (
    _WIDE_PLAN_KW,
    _wide_plan,
    conv3x3_apply_vae,
    plan_conv_blocks,
)


def timed_chain(make_out, a0, iters=30):
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


def xla_conv(x, w, b):
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b.astype(out.dtype)


# the SHIPPED dispatcher (ops/conv.conv3x3_apply_vae): wide plans + h-slabs
pallas_slab = lambda x, w, b, n_slabs: conv3x3_apply_vae(x, w, b)


key = jax.random.PRNGKey(0)
z8 = jnp.ones((8, 128), jnp.bfloat16)
floor = timed_chain(lambda a: a + 1.0, z8)
print(f"floor: {floor*1e3:.3f} ms", flush=True)

shapes = [
    ("64x128 512->512", 64, 128, 512, 512, 1),
    ("128x256 512->512", 128, 256, 512, 512, 1),
    ("256x512 512->512", 256, 512, 512, 512, 1),
    ("256x512 256->256", 256, 512, 256, 256, 1),
    ("512x1024 256->256", 512, 1024, 256, 256, 2),
    ("512x1024 128->128", 512, 1024, 128, 128, 2),
]
for name, h, wd, ci, co, n_slabs in shapes:
    ks = jax.random.split(jax.random.fold_in(key, h * ci), 3)
    x = jax.random.normal(ks[0], (1, h, wd, ci), jnp.bfloat16)
    w = jax.random.normal(ks[1], (3, 3, ci, co), jnp.bfloat16) * 0.02
    b = jax.random.normal(ks[2], (co,), jnp.float32) * 0.01
    wp = _wide_plan(h, wd, ci, co)
    print(f"{name}: wide_plan={wp}", flush=True)
    if wp is None:
        continue
    # numerics first
    ox = jax.jit(lambda x: xla_conv(x, w, b))(x)
    op_ = jax.jit(lambda x: pallas_slab(x, w, b, n_slabs))(x)
    md = float(jnp.max(jnp.abs(ox.astype(jnp.float32) - op_.astype(jnp.float32))))
    fl = 2 * 9 * h * wd * ci * co
    tx = timed_chain(lambda x: xla_conv(x, w, b) if co == ci else xla_conv(x, w, b)[..., :ci], x) - floor
    tp = timed_chain(lambda x: pallas_slab(x, w, b, n_slabs) if co == ci else pallas_slab(x, w, b, n_slabs)[..., :ci], x) - floor
    print(
        f"{name}: XLA {tx*1e3:.3f} ms ({fl/tx/1e12:.1f} TF/s) | "
        f"Pallas {tp*1e3:.3f} ms ({fl/tp/1e12:.1f} TF/s) | "
        f"maxdiff {md:.2e} | {'PALLAS WIN' if tp < 0.9 * tx else 'no win'}",
        flush=True,
    )

print("VAECONV PROBE DONE", flush=True)
