"""Round-3: where is the rest of the 13.4ms non-attention non-FF time?
Ablate the conv compute (replace conv3x3 + the fused GN/SiLU/conv prologue
with cheap channel-matching stand-ins) to split "conv stacks" from
"skeleton + projections + LN glue"."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import flax.linen as nn

print("backend:", jax.devices()[0].platform, flush=True)

import leftrefill_tpu.models.unet as unet_mod
import leftrefill_tpu.ops.quant as quant_mod
from leftrefill_tpu.ops.quant import quantize_params_like


def timed(fn, x, *rest, iters=60):
    def body(c, _):
        return fn(c, *rest), None
    loop = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=iters)[0])
    drain = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    float(drain(loop(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(drain(loop(x))); ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


z = jnp.ones((8, 128), jnp.bfloat16)
print(f"floor: {timed(lambda c: c + 1.0, z)*1e3:.3f} ms", flush=True)


def fake_conv_forward(x, kernel, bias, scale, dtype, quant, strides=1, res=None):
    co = kernel.shape[-1]
    ci = x.shape[-1]
    x = x.astype(dtype)
    if strides != 1:
        x = x[:, ::strides, ::strides]
    if co <= ci:
        out = x[..., :co] + bias.astype(dtype)
    else:
        out = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, co - ci),)) + bias.astype(dtype)
    return out + res.astype(dtype) if res is not None else out


def fake_gn_silu_conv(x, gs, gb, wq, ws, cb, num_groups, emb=None,
                      scale_shift=None, out_dtype=jnp.bfloat16, res=None,
                      moments=None, emit_moments=False):
    out = fake_conv_forward(x, wq, cb, ws, out_dtype, True, res=res)
    return (out, None) if emit_moments else out


def unet_time(label, patch_conv=False):
    orig_cf = unet_mod.conv3x3_forward
    orig_gn = quant_mod.gn_silu_conv3x3_int8
    try:
        if patch_conv:
            unet_mod.conv3x3_forward = fake_conv_forward
            quant_mod.gn_silu_conv3x3_int8 = fake_gn_silu_conv
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

        t = timed(fwd, xin, params, tt, ctx)
        print(f"{label}: {t*1e3:.2f} ms", flush=True)
    finally:
        unet_mod.conv3x3_forward = orig_cf
        quant_mod.gn_silu_conv3x3_int8 = orig_gn


unet_time("full int8 stock")
unet_time("int8, conv3x3->slice/pad", patch_conv=True)
print("SPLIT4 DONE", flush=True)
