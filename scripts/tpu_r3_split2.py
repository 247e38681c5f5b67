"""Round-3: in-situ ablation of the no-transformer UNet (b2, int8) — patch
GroupNorm32 / Conv3x3 to near-free stand-ins to attribute the conv-path time
that per-op microbenches can't see (everything measures at the harness
floor individually)."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
import flax.linen as nn

print("backend:", jax.devices()[0].platform, flush=True)

import leftrefill_tpu.models.unet as unet_mod
from leftrefill_tpu.ops.quant import quantize_params_like


def timed(fn, x, *rest, iters=60):
    def body(c, _):
        o = fn(c, *rest)
        return o, None
    loop = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=iters)[0])
    drain = jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))
    float(drain(loop(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(drain(loop(x))); ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


class IdentityGN(nn.Module):
    """Param-compatible GroupNorm stand-in that skips the normalization."""
    num_groups: int = 32
    eps: float = 1e-5
    param_dtype = jnp.float32
    fast_affine: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


class Conv1x1Standin(unet_mod.Conv3x3):
    """Param-compatible 3x3-conv stand-in using only the center tap (a plain
    dot): ~1/9 the FLOPs, no Pallas, no quantize/pad/copy prologue."""

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero else nn.initializers.lecun_normal(),
            (3, 3, ci, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if self.quant:
            self.param("kernel_scale", nn.initializers.ones, (self.features,), jnp.float32)
        k = kernel[1, 1].astype(jnp.float32) * 0.0 + 0.002  # constant-ish, cheap
        return (x.astype(self.dtype) @ k.astype(self.dtype)) + bias.astype(self.dtype)


def unet_time(label, quant, gn=None, conv=None, **kw):
    orig_gn, orig_conv = unet_mod.GroupNorm32, unet_mod.Conv3x3
    try:
        if gn is not None:
            unet_mod.GroupNorm32 = gn
        if conv is not None:
            unet_mod.Conv3x3 = conv
        m = unet_mod.UNetModel(dtype=jnp.bfloat16, quant=quant, **kw)
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
            return jnp.concatenate([o, o, c[..., :1]], axis=-1) * 1e-3 + c * 0.999

        t = timed(fwd, xin, params, tt, ctx)
        print(f"{label}: {t*1e3:.2f} ms", flush=True)
        return t
    finally:
        unet_mod.GroupNorm32, unet_mod.Conv3x3 = orig_gn, orig_conv


z = jnp.ones((8, 128), jnp.bfloat16)
t0 = timed(lambda c: c + 1.0, z)
print(f"floor: {t0*1e3:.3f} ms", flush=True)

NT = dict(attention_resolutions=())
unet_time("no-attn int8 stock", True, **NT)
unet_time("no-attn int8, GN->affine-only", True, gn=IdentityGN, **NT)
unet_time("no-attn int8, conv->center-dot", True, conv=Conv1x1Standin, **NT)
unet_time("no-attn skeleton (both stand-ins)", True, gn=IdentityGN, conv=Conv1x1Standin, **NT)
unet_time("no-attn bf16 stock", False, **NT)
unet_time("no-attn bf16, conv->center-dot", False, conv=Conv1x1Standin, **NT)
print("SPLIT2 DONE", flush=True)
