"""Round-3: A/B the unmaterialized decoder skip-cat (LEFTREFILL_SPLIT_CAT)
on the full UNet fwd b2 int8 — the decoder's th.cat([h, hs.pop()]) previously
materialized a (C1+C2)-wide bf16 tensor per output block (write + two reads:
GN moments + quant pass); the split path runs per-part moments, per-part
affine+SiLU+quant and split-kernel convs chained via the fused-res epilogue.
Chained in-graph timing per CLAUDE.md."""
import sys
sys.exit("OBSOLETE (r5): the SPLIT_CAT/CONV_MOMENTS gates it toggles were DELETED in r5 (measured <=0% e2e, r4 bisect) - both arms would now run the SAME graph and 'confirm' nothing. This script is kept as the historical record of how the measurement was made; restore the deleted code from git history to re-run it.")
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

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


for cat_flag, lnq_flag, mom_flag in (
    ("0", "0", "0"),
    ("1", "0", "0"),
    ("1", "1", "0"),
    ("1", "1", "1"),
    ("0", "1", "1"),
):
    os.environ["LEFTREFILL_SPLIT_CAT"] = cat_flag
    os.environ["LEFTREFILL_FUSED_LNQ"] = lnq_flag
    os.environ["LEFTREFILL_CONV_MOMENTS"] = mom_flag
    t = timed(fwd, xin, params, tt, ctx)
    print(
        f"UNet fwd b2 int8 SPLIT_CAT={cat_flag} LNQ={lnq_flag} "
        f"MOMENTS={mom_flag}: {t*1e3:.2f} ms",
        flush=True,
    )

print("SPLITCAT AB DONE", flush=True)
