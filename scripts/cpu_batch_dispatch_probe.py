"""Round-4 b4 autopsy (CPU half): do the fused-kernel QUALIFIERS change with
batch size?  Traces the full-size int8 UNet at CFG batch 2/4/8/16 with
jax.eval_shape (no compile) under the SHIPPED defaults (fusion family off)
and counts every kernel entry point — a batch-dependent fallback here would
explain r3's b4 e2e loss (0.43 < b1 0.7155 canvases/s) without touching the
chip.

Run: python scripts/cpu_batch_dispatch_probe.py
"""
import sys, json
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from types import SimpleNamespace

import leftrefill_tpu.ops.conv as conv_mod
import leftrefill_tpu.ops.attention as attn_mod

conv_mod.on_tpu = lambda: True


class _FakeJax:
    def __getattr__(self, n):
        return getattr(jax, n)

    def devices(self):
        return [SimpleNamespace(platform="tpu")]


attn_mod.jax = _FakeJax()

import leftrefill_tpu.ops.flash_attention as fa_mod
import leftrefill_tpu.ops.mlp as mlp_mod
import leftrefill_tpu.ops.quant as quant_mod

from leftrefill_tpu.models.unet import UNetModel
from leftrefill_tpu.ops.quant import quantize_params_like

KERNELS = [
    (quant_mod, "conv3x3_int8"),
    (quant_mod, "conv3x3_int8_single"),
    (quant_mod, "conv3x3_int8_copy3"),
    (quant_mod, "dense_int8"),
    (quant_mod, "dense_int8_res_mom"),
    (quant_mod, "ln_quant_rowwise"),
    (quant_mod, "gn_quant_rowwise"),
    (mlp_mod, "geglu_fused_int8"),
    (mlp_mod, "geglu_fused"),
    (conv_mod, "conv3x3_apply"),
    (conv_mod, "_conv3x3_pallas"),
    (conv_mod, "_xla_conv"),
    (fa_mod, "_flash_forward"),
]

counts = {}
origs = {}
for mod, name in KERNELS:
    orig = getattr(mod, name)
    origs[(id(mod), name)] = orig

    def make(name, orig):
        def w(*a, **k):
            counts[name] = counts.get(name, 0) + 1
            return orig(*a, **k)

        return w

    setattr(mod, name, make(name, orig))

m = UNetModel(dtype=jnp.bfloat16, quant=True)
for b in (2, 4, 8, 16):
    x = jax.ShapeDtypeStruct((b, 64, 128, 9), jnp.bfloat16)
    t = jax.ShapeDtypeStruct((b,), jnp.int32)
    ctx = jax.ShapeDtypeStruct((b, 77, 1024), jnp.bfloat16)
    struct = jax.eval_shape(m.init, jax.random.PRNGKey(0), x, t, ctx)["params"]
    struct = jax.eval_shape(lambda p: quantize_params_like(struct, p), struct)
    counts.clear()
    jax.eval_shape(lambda p, a, tt, c: m.apply({"params": p}, a, tt, c), struct, x, t, ctx)
    print(json.dumps({"cfg_batch": b, **dict(sorted(counts.items()))}), flush=True)
