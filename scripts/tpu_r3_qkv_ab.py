"""Round-3: in-process A/B of the fused-QKV projection vs per-projection
GEMMs (int8 UNet fwd b2) — cross-process relay variance makes separate runs
untrustworthy at the ~1ms scale.

RESULT (v5e, 2 repeats each): fused 30.56/30.54 ms, unfused 29.79/29.72 ms —
the column-concatenated single GEMM is ~0.8 ms SLOWER end-to-end: the
jnp.split of the fused [N, 3*inner] output materializes three full-tensor
copies in HBM (the per-head reshape consumers and the Pallas flash operands
can't alias a slice), which outweighs the saved GEMM dispatches.  The model
keeps per-projection GEMMs with ONE shared activation-quantization pass; the
LEFTREFILL_FUSED_QKV gate this script drove was removed with the revert."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

print("backend:", jax.devices()[0].platform, flush=True)

import leftrefill_tpu.models.unet as unet_mod
from leftrefill_tpu.ops.quant import quantize_params_like


def timed(fn, x, *rest, iters=30):
    def body(c, _):
        return fn(c, *rest), None
    loop = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=iters)[0])
    drain = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    float(drain(loop(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(drain(loop(x))); ts.append((time.perf_counter() - t0) / iters)
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


def make_fwd():
    def fwd(c, p, tt, ctx):
        o = m.apply(p, c[..., :9], tt, ctx)
        return jnp.concatenate([o, o, c[..., :1]], axis=-1) * 1e-3 + c * 0.999
    return fwd


for mode in ("1", "0", "1", "0"):
    os.environ["LEFTREFILL_FUSED_QKV"] = mode
    t = timed(make_fwd(), xin, params, tt, ctx)
    print(f"UNet fwd b2 int8 [qkv_fused={mode}]: {t*1e3:.2f} ms", flush=True)
print("QKVAB DONE", flush=True)
