"""Round-3: A/B the fused-residual conv epilogue (LEFTREFILL_FUSED_RESADD)
on the full UNet fwd b2 int8 — the ResBlock skip+h add previously ran as a
separate XLA pass over the Pallas conv output (one extra HBM write+read of h
per block, ~30 blocks/step).  Chained in-graph timing per CLAUDE.md.
"""
import sys
sys.exit("OBSOLETE (r5): the LEFTREFILL_FUSED_RESADD/FFRES gates it toggles were DELETED in r5 (measured -1.0/-1.3% e2e, r4 bisect) - both arms would now run the SAME graph and 'confirm' nothing. This script is kept as the historical record of how the measurement was made; restore the deleted code from git history to re-run it.")
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.devices()[0].platform, flush=True)

import leftrefill_tpu.models.unet as unet_mod
from leftrefill_tpu.ops.quant import quantize_params_like


def timed(fn, x, *rest, iters=40):
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


outs = {}
for conv_flag, ff_flag in (("0", "0"), ("1", "0"), ("1", "1")):
    os.environ["LEFTREFILL_FUSED_RESADD"] = conv_flag
    os.environ["LEFTREFILL_FUSED_FFRES"] = ff_flag
    t = timed(fwd, xin, params, tt, ctx)
    outs[(conv_flag, ff_flag)] = t
    print(
        f"UNet fwd b2 int8 RESADD={conv_flag} FFRES={ff_flag}: {t*1e3:.2f} ms",
        flush=True,
    )

d1 = (outs[("0", "0")] - outs[("1", "0")]) * 1e3
d2 = (outs[("1", "0")] - outs[("1", "1")]) * 1e3
print(f"conv fused-residual saving: {d1:+.2f} ms/step", flush=True)
print(f"ff fused-residual saving:   {d2:+.2f} ms/step", flush=True)

# bf16 model: same A/B for the conv3x3_res_op / bf16 GEGLU-res variants
mb = unet_mod.UNetModel(dtype=jnp.bfloat16, quant=False)
pb = jax.tree_util.tree_map(
    lambda s: (jnp.ones(s.shape, jnp.float32) * 0.002).astype(s.dtype),
    jax.eval_shape(mb.init, jax.random.PRNGKey(7), xin, tt, ctx),
)


def fwd_b(c, p, tt, ctx):
    o = mb.apply(p, c[..., :9], tt, ctx)
    return jnp.concatenate([o, o, c[..., :1]], axis=-1) * 1e-3 + c * 0.999


outs_b = {}
for conv_flag, ff_flag in (("0", "0"), ("1", "0"), ("1", "1")):
    os.environ["LEFTREFILL_FUSED_RESADD"] = conv_flag
    os.environ["LEFTREFILL_FUSED_FFRES"] = ff_flag
    t = timed(fwd_b, xin, pb, tt, ctx)
    outs_b[(conv_flag, ff_flag)] = t
    print(
        f"UNet fwd b2 bf16 RESADD={conv_flag} FFRES={ff_flag}: {t*1e3:.2f} ms",
        flush=True,
    )
print(
    f"bf16 conv fused-residual saving: "
    f"{(outs_b[('0','0')] - outs_b[('1','0')])*1e3:+.2f} ms/step",
    flush=True,
)
print(
    f"bf16 ff fused-residual saving:   "
    f"{(outs_b[('1','0')] - outs_b[('1','1')])*1e3:+.2f} ms/step",
    flush=True,
)
print("RESADD AB DONE", flush=True)
