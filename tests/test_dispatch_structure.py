"""Structural dispatch regression net: the numeric on==off fusion tests can't
catch a *silently-untaken* fused path (e.g. a qualifier/VMEM-plan regression
that makes every site fall back to XLA keeps all parity tests green while the
measured perf collapses).  This test traces the FULL-SIZE (865M, b2, 64x128)
int8 UNet forward with ``jax.eval_shape`` — no compile, no execution — while
counting invocations of every fused kernel entry point, and pins the counts
to the SD2-inpainting architecture (reference
ldm/modules/diffusionmodules/openaimodel.py:512-796):

  22 ResBlocks (8 in + 2 mid + 12 out) x 2 convs = 44 3x3 convs
  16 SpatialTransformers (6 in + 1 mid + 9 out), 1 self + 1 cross + GEGLU each
  3 Upsample convs, 3 stride-2 Downsample convs, conv_in (9ch) + zero out conv

The counts pin the SHIPPED default configuration (LEFTREFILL_FUSED_RES and
LEFTREFILL_FUSED_LNQ default-ON — the two r4-bisect winners, +1.48% ddim50 /
+3.8% dpm15; the four measured-loser gates FFRES/RESADD/SPLIT_CAT/
CONV_MOMENTS were deleted in r5).
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import pytest


@pytest.fixture
def forced_tpu_dispatch(monkeypatch):
    """Make every platform probe see TPU so the Pallas dispatchers engage
    (tracing only — nothing is lowered or run)."""
    import leftrefill_tpu.ops.attention as attn_mod
    import leftrefill_tpu.ops.conv as conv_mod

    monkeypatch.setattr(conv_mod, "on_tpu", lambda: True)

    class _FakeJax:  # attention._flash_qualifies reads jax.devices() inline
        def __getattr__(self, n):
            return getattr(jax, n)

        def devices(self):
            return [SimpleNamespace(platform="tpu")]

    monkeypatch.setattr(attn_mod, "jax", _FakeJax())


#: the two surviving fusion gates (both default-ON since r4b; pinned
#: explicitly so the trace doesn't depend on ambient env)
FUSION_FAMILY = (
    "LEFTREFILL_FUSED_RES",
    "LEFTREFILL_FUSED_LNQ",
)


def _count_unet_dispatch(monkeypatch, quant: bool):
    for f in FUSION_FAMILY:
        monkeypatch.setenv(f, "1")
    import leftrefill_tpu.ops.conv as conv_mod
    import leftrefill_tpu.ops.flash_attention as fa_mod
    import leftrefill_tpu.ops.mlp as mlp_mod
    import leftrefill_tpu.ops.quant as quant_mod

    counts = {}

    def wrap(mod, name):
        orig = getattr(mod, name)

        def w(*a, **k):
            counts[name] = counts.get(name, 0) + 1
            return orig(*a, **k)

        monkeypatch.setattr(mod, name, w)

    for n in (
        "gn_silu_conv3x3_int8",
        "conv3x3_int8",
        "dense_int8",
        "dense_int8_res_mom",
        "ln_quant_rowwise",
        "gn_quant_rowwise",
        "conv_int8_xla",
    ):
        wrap(quant_mod, n)
    wrap(mlp_mod, "geglu_fused_int8")
    wrap(mlp_mod, "geglu_fused")
    wrap(conv_mod, "conv3x3_apply")
    wrap(fa_mod, "_flash_forward")

    from leftrefill_tpu.models.unet import UNetModel
    from leftrefill_tpu.ops.quant import quantize_params_like

    m = UNetModel(dtype=jnp.bfloat16, quant=quant)
    x = jax.ShapeDtypeStruct((2, 64, 128, 9), jnp.bfloat16)
    t = jax.ShapeDtypeStruct((2,), jnp.int32)
    ctx = jax.ShapeDtypeStruct((2, 77, 1024), jnp.bfloat16)
    struct = jax.eval_shape(m.init, jax.random.PRNGKey(0), x, t, ctx)["params"]
    if quant:
        struct = jax.eval_shape(lambda p: quantize_params_like(struct, p), struct)
    counts.clear()
    out = jax.eval_shape(
        lambda p, a, b, c: m.apply({"params": p}, a, b, c), struct, x, t, ctx
    )
    assert out.shape == (2, 64, 128, 4)
    return counts


@pytest.mark.slow
def test_int8_unet_dispatch_counts(forced_tpu_dispatch, monkeypatch):
    c = _count_unet_dispatch(monkeypatch, quant=True)
    # all 44 ResBlock 3x3 convs run the fused GN+SiLU+quant+conv kernel
    # (decoder first-convs consume the materialized skip concat)
    assert c.get("gn_silu_conv3x3_int8", 0) == 44
    # only conv_in (9ch input stays fp by design) and the zero-init out conv
    # bypass int8
    assert c.get("conv3x3_apply", 0) == 2
    # the 3 Upsample convs take the plain int8 conv kernel; the 3 stride-2
    # Downsample convs use the dequant path (conv_int8_xla is opt-in)
    assert c.get("conv3x3_int8", 0) == 3
    assert c.get("conv_int8_xla", 0) == 0
    # 16 transformers: every LN (3 per block) is the fused LN+quant kernel,
    # every proj_in GN the fused GN+quant kernel, every FF the int8 GEGLU
    assert c.get("ln_quant_rowwise", 0) == 48
    assert c.get("gn_quant_rowwise", 0) == 16
    assert c.get("geglu_fused_int8", 0) == 16
    assert c.get("geglu_fused", 0) == 0
    # proj_out fused GEMM+residual where the row plan exists
    assert c.get("dense_int8_res_mom", 0) == 11
    # every self-attention runs the Pallas flash kernel except the 128-token
    # middle block (below the lane-tile minimum); cross-attn (Nk=77) is XLA
    assert c.get("_flash_forward", 0) == 15
    # remaining dense sites (attention projections, cross k/v, skip 1x1,
    # emb projections, unfused proj_out) — pinned as a total.  r5: the
    # split-kernel skip-1x1 (two GEMMs over the unmaterialized concat,
    # part of the deleted SPLIT_CAT family) collapsed to one GEMM per
    # decoder skip site: 175 - 12 = 163
    assert c.get("dense_int8", 0) == 163


def test_bf16_unet_dispatch_counts(forced_tpu_dispatch, monkeypatch):
    c = _count_unet_dispatch(monkeypatch, quant=False)
    # bf16 path: 49 stride-1 3x3 convs through the Pallas conv dispatcher
    # (44 ResBlock + conv_in/out + 3 Upsample; stride-2 Downsamples are XLA),
    # the fused bf16 GEGLU, same 15 flash self-attentions
    assert c.get("conv3x3_apply", 0) == 49
    assert c.get("geglu_fused", 0) == 16
    assert c.get("_flash_forward", 0) == 15
    for int8_only in (
        "gn_silu_conv3x3_int8",
        "conv3x3_int8",
        "dense_int8",
        "ln_quant_rowwise",
        "gn_quant_rowwise",
        "geglu_fused_int8",
    ):
        assert c.get(int8_only, 0) == 0, int8_only
