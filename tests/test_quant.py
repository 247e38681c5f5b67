"""W8A8 int8 inference path (ops/quant.py): kernel parity in interpret mode,
dequant-fallback exactness, tree quantization, and end-to-end closeness of a
quantized UNet to its fp counterpart."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from leftrefill_tpu.ops.conv import _xla_conv
from leftrefill_tpu.ops.quant import (
    conv3x3_int8,
    conv3x3_int8_reference,
    dense_int8,
    quantize_activation,
    quantize_params_like,
    quantize_weight,
)


def test_int8_conv_kernel_matches_emulated_reference():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (2, 16, 32, 128), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, 128, 128), jnp.float32) * 0.05
    b = jax.random.normal(ks[2], (128,), jnp.float32)
    wq, ws = quantize_weight(w)
    ref = np.asarray(conv3x3_int8_reference(x, wq, ws, b))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(conv3x3_int8(x, wq, ws, b, out_dtype=jnp.float32))
    assert np.abs(out - ref).max() < 1e-4


@pytest.mark.parametrize(
    "shape",
    [
        (2, 16, 32, 128, 128),   # aligned
        (1, 16, 32, 160, 96),    # both sides need 128-padding
        (1, 8, 16, 320, 320),    # the L0 channel count (pads to 384)
    ],
)
def test_int8_conv_single_matches_emulated_reference(shape):
    """Single-input kernel (round-3) == the emulated int8 oracle, including
    the channel-padded plans where the output is sliced back."""
    from leftrefill_tpu.ops.quant import _plan_int8_single, conv3x3_int8_single

    b, h, w_, ci, co = shape
    assert _plan_int8_single(h, w_, ci, co) is not None
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    x = jax.random.normal(ks[0], (b, h, w_, ci), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, ci, co), jnp.float32) * 0.05
    bias = jax.random.normal(ks[2], (co,), jnp.float32)
    wq, ws = quantize_weight(w)
    ref = np.asarray(conv3x3_int8_reference(x, wq, ws, bias))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(conv3x3_int8_single(x, wq, ws, bias, out_dtype=jnp.float32))
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 1e-4


def test_int8_conv_single_plan_covers_unet_levels():
    """Every conv shape in the 865M UNet (64x128 latent) has a single-input
    plan — the whole int8 conv path should take the faster kernel."""
    from leftrefill_tpu.ops.quant import _plan_int8_single

    shapes = [
        (64, 128, 320, 320), (64, 128, 640, 320), (64, 128, 960, 320),
        (32, 64, 640, 640), (32, 64, 960, 640), (32, 64, 1280, 640),
        (16, 32, 1280, 1280), (16, 32, 1920, 1280), (16, 32, 2560, 1280),
        (8, 16, 1280, 1280), (8, 16, 2560, 1280),
    ]
    for h, w, ci, co in shapes:
        assert _plan_int8_single(h, w, ci, co) is not None, (h, w, ci, co)


def test_int8_conv_accuracy_vs_fp():
    """W8A8 relative error at SD-like magnitudes stays ~1%."""
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (1, 16, 32, 128), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, 128, 128), jnp.float32) * 0.05
    b = jnp.zeros((128,), jnp.float32)
    wq, ws = quantize_weight(w)
    ref = np.asarray(conv3x3_int8_reference(x, wq, ws, b))
    fp = np.asarray(_xla_conv(x, w, b))
    rel = np.abs(ref - fp).max() / np.abs(fp).max()
    assert rel < 0.03, rel


def test_dense_int8_rowwise_beats_per_tensor_on_outliers():
    """Per-row activation scales (round-3): with one hot row, the per-tensor
    scale collapses every other row's resolution; per-row must be strictly
    more accurate and broadcast correctly through dense_int8."""
    from leftrefill_tpu.ops.quant import quantize_activation_rowwise

    ks = jax.random.split(jax.random.PRNGKey(5), 2)
    x = jax.random.normal(ks[0], (64, 96), jnp.float32)
    x = x.at[3].mul(200.0)  # outlier token
    w = jax.random.normal(ks[1], (96, 48), jnp.float32) * 0.1
    wq, ws = quantize_weight(w)
    fp = np.asarray(x @ w)

    xq_t, s_t = quantize_activation(x)
    err_t = np.abs(np.asarray(dense_int8(xq_t, s_t, wq, ws, out_dtype=jnp.float32)) - fp)
    xq_r, s_r = quantize_activation_rowwise(x)
    assert s_r.shape == (64, 1)
    err_r = np.abs(np.asarray(dense_int8(xq_r, s_r, wq, ws, out_dtype=jnp.float32)) - fp)
    # non-outlier rows: rowwise error should be far smaller
    norm = np.abs(fp).max()
    rows = [i for i in range(64) if i != 3]
    assert err_r[rows].max() < err_t[rows].max() / 5
    assert err_r.max() / norm < 0.05


def test_dense_int8_accuracy():
    ks = jax.random.split(jax.random.PRNGKey(2), 2)
    x = jax.random.normal(ks[0], (64, 96), jnp.float32)
    w = jax.random.normal(ks[1], (96, 48), jnp.float32) * 0.1
    wq, ws = quantize_weight(w)
    xq, sx = quantize_activation(x)
    out = np.asarray(dense_int8(xq, sx, wq, ws, out_dtype=jnp.float32))
    fp = np.asarray(x @ w)
    assert np.abs(out - fp).max() / np.abs(fp).max() < 0.03


def _tiny_unet(quant):
    from leftrefill_tpu.models.unet import UNetModel

    return UNetModel(
        in_channels=9, model_channels=128, out_channels=4, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1,), num_head_channels=32,
        context_dim=64, dtype=jnp.float32, quant=quant,
    )


@pytest.mark.slow
def test_quantized_unet_close_to_fp():
    """quantize_params_like + the quant UNet: CPU path takes the exact
    dequant fallback for convs (no TPU) and real int8 dense for projections;
    output must stay close to the fp model."""
    fp_model = _tiny_unet(False)
    q_model = _tiny_unet(True)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 16, 32, 9).astype(np.float32)
    t = np.array([7], np.int64)
    ctx = rng.randn(1, 77, 64).astype(np.float32)

    params = jax.jit(fp_model.init)(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)
    )["params"]
    # unzero the zero-init projections so the comparison is non-trivial
    from tests.test_tasks import unzero_kernels

    params = unzero_kernels(params)
    q_struct = jax.eval_shape(
        q_model.init, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)
    )["params"]
    qparams = quantize_params_like(q_struct, params)

    # every site with a scale got an int8 kernel
    n_int8 = sum(
        1 for leaf in jax.tree_util.tree_leaves(qparams) if leaf.dtype == jnp.int8
    )
    assert n_int8 > 10

    fp_out = np.asarray(
        jax.jit(fp_model.apply)({"params": params}, x, t, ctx)
    )
    q_out = np.asarray(jax.jit(q_model.apply)({"params": qparams}, x, t, ctx))
    denom = np.abs(fp_out).max()
    rel = np.abs(q_out - fp_out).max() / max(denom, 1e-6)
    assert np.isfinite(q_out).all()
    assert rel < 0.15, rel  # W8A8 noise accumulates over the whole net


def test_geglu_fused_matches_reference():
    """Fused GEGLU kernel (ops/mlp.py) == the XLA oracle (value*gelu_erf(gate)
    then dot), bf16-weights path, in interpret mode."""
    from leftrefill_tpu.ops.mlp import _plan, geglu_fused, geglu_reference

    r, din, mult = 256, 128, 4
    inner, dout = din * mult, din
    assert _plan(r, din, inner, dout, x_elt=2, w_elt=2) is not None
    ks = jax.random.split(jax.random.PRNGKey(11), 5)
    x = jax.random.normal(ks[0], (r, din), jnp.float32)
    w1 = jax.random.normal(ks[1], (din, 2 * inner), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[2], (2 * inner,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[3], (inner, dout), jnp.float32) * 0.05
    b2 = jax.random.normal(ks[4], (dout,), jnp.float32) * 0.1
    ref = np.asarray(geglu_reference(x, w1, b1, w2, b2))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(geglu_fused(x, w1, b1, w2, b2))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 0.02, rel  # bf16 matmuls vs fp32 oracle

    # the training path must differentiate through the fused op (custom VJP)
    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(lambda w: jnp.sum(geglu_fused(x, w, b1, w2, b2) ** 2))(w1)
    g_ref = jax.grad(lambda w: jnp.sum(geglu_reference(x, w, b1, w2, b2) ** 2))(w1)
    rel_g = np.abs(np.asarray(g) - np.asarray(g_ref)).max() / max(
        np.abs(np.asarray(g_ref)).max(), 1e-6
    )
    assert rel_g < 0.05, rel_g


def test_geglu_fused_int8_matches_reference():
    from leftrefill_tpu.ops.mlp import _plan, geglu_fused_int8, geglu_reference

    r, din, mult = 256, 128, 4
    inner, dout = din * mult, din
    assert _plan(r, din, inner, dout, x_elt=1, w_elt=1) is not None
    ks = jax.random.split(jax.random.PRNGKey(12), 5)
    x = jax.random.normal(ks[0], (r, din), jnp.float32)
    w1 = jax.random.normal(ks[1], (din, 2 * inner), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[2], (2 * inner,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[3], (inner, dout), jnp.float32) * 0.05
    b2 = jax.random.normal(ks[4], (dout,), jnp.float32) * 0.1
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    ref = np.asarray(geglu_reference(x, w1, b1, w2, b2))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(
            geglu_fused_int8(x, w1q, s1, b1, w2q, s2, b2, out_dtype=jnp.float32)
        )
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel  # two W8A8 stages


def test_geglu_module_param_tree_unchanged():
    """The fused-kernel rewrite must keep the exact net_0_proj/net_2 tree the
    torch converter targets (kernel/bias [+kernel_scale])."""
    from leftrefill_tpu.models.unet import GEGLUFeedForward

    for quant in (False, True):
        m = GEGLUFeedForward(dim=32, dtype=jnp.float32, quant=quant)
        p = jax.eval_shape(m.init, jax.random.PRNGKey(0), jnp.zeros((2, 8, 32)))["params"]
        expected = {"kernel", "bias"} | ({"kernel_scale"} if quant else set())
        assert set(p) == {"net_0_proj", "net_2"}
        assert set(p["net_0_proj"]) == expected
        assert p["net_0_proj"]["kernel"].shape == (32, 256)
        assert p["net_2"]["kernel"].shape == (128, 32)


@pytest.mark.parametrize("mode", ["plain", "emb", "scale_shift"])
def test_gn_silu_conv_fused_matches_unfused(mode):
    """Fused GN+SiLU+quantize+conv (round-3 prologue) == the unfused chain
    (GroupNorm32 fp32 stats -> silu -> per-tensor int8 conv), incl. the
    algebraic emb-add / scale-shift folds."""
    from leftrefill_tpu.ops.layers import group_norm32
    from leftrefill_tpu.ops.quant import (
        conv3x3_int8_reference,
        gn_silu_conv3x3_int8,
    )

    b, h, w, c, co = 2, 16, 32, 128, 128
    ks = jax.random.split(jax.random.PRNGKey(20), 6)
    x = jax.random.normal(ks[0], (b, h, w, c), jnp.float32)
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (c,), jnp.float32)
    beta = 0.1 * jax.random.normal(ks[2], (c,), jnp.float32)
    wt = jax.random.normal(ks[3], (3, 3, c, co), jnp.float32) * 0.05
    bias = jax.random.normal(ks[4], (co,), jnp.float32) * 0.1
    wq, ws = quantize_weight(wt)
    emb = scale_shift = None
    if mode == "emb":
        emb = jax.random.normal(ks[5], (b, c), jnp.float32)
    elif mode == "scale_shift":
        s_, t_ = jnp.split(jax.random.normal(ks[5], (b, 2 * c), jnp.float32) * 0.3, 2, -1)
        scale_shift = (s_, t_)

    # unfused oracle
    if mode == "emb":
        y = group_norm32(x + emb[:, None, None, :], gamma, beta, num_groups=32)
    else:
        y = group_norm32(x, gamma, beta, num_groups=32)
        if mode == "scale_shift":
            y = y * (1 + scale_shift[0][:, None, None, :]) + scale_shift[1][:, None, None, :]
    y = jax.nn.silu(y)
    ref = np.asarray(conv3x3_int8_reference(y, wq, ws, bias))

    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(
            gn_silu_conv3x3_int8(
                x, gamma, beta, wq, ws, bias, num_groups=32,
                emb=emb, scale_shift=scale_shift, out_dtype=jnp.float32,
            )
        )
    rel = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert rel < 0.02, (mode, rel)


def test_qconv1x1_int8_matches_fp():
    """QConv1x1 (ResBlock.skip_connection int8 path): int8 GEMM with per-row
    activation scales stays close to the fp 1x1 conv."""
    from leftrefill_tpu.models.unet import QConv1x1

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 16, 96).astype(np.float32))
    m = QConv1x1(features=64, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    fp = np.asarray(m.apply({"params": params}, x))

    wq, ws = quantize_weight(params["kernel"], axis=-1)
    qparams = dict(params, kernel=wq, kernel_scale=ws)
    q = np.asarray(m.apply({"params": qparams}, x))
    assert np.abs(q - fp).max() / np.abs(fp).max() < 0.03


@pytest.mark.slow
def test_quantized_unet_covers_skip_and_upsample():
    """A channel-changing UNet (channel_mult (1,2)) quantizes the skip 1x1 and
    the Upsample conv too (previously fp XLA convs) and stays close to fp."""
    from leftrefill_tpu.models.unet import UNetModel

    def mk(quant):
        return UNetModel(
            in_channels=9, model_channels=64, out_channels=4, num_res_blocks=1,
            attention_resolutions=(1,), channel_mult=(1, 2), num_head_channels=32,
            context_dim=64, dtype=jnp.float32, quant=quant,
        )

    fp_model, q_model = mk(False), mk(True)
    rng = np.random.RandomState(1)
    x = rng.randn(1, 16, 32, 9).astype(np.float32)
    t = np.array([11], np.int64)
    ctx = rng.randn(1, 77, 64).astype(np.float32)
    args = (jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx))

    params = jax.jit(fp_model.init)(jax.random.PRNGKey(0), *args)["params"]
    from tests.test_tasks import unzero_kernels

    params = unzero_kernels(params)
    q_struct = jax.eval_shape(q_model.init, jax.random.PRNGKey(0), *args)["params"]
    qparams = quantize_params_like(q_struct, params)

    # the previously-fp sites now carry int8 kernels
    assert qparams["output_blocks_1_0"]["skip_connection"]["kernel"].dtype == jnp.int8
    assert qparams["output_blocks_1_1"]["conv"]["kernel"].dtype == jnp.int8

    fp_out = np.asarray(jax.jit(fp_model.apply)({"params": params}, x, t, ctx))
    q_out = np.asarray(jax.jit(q_model.apply)({"params": qparams}, x, t, ctx))
    rel = np.abs(q_out - fp_out).max() / max(np.abs(fp_out).max(), 1e-6)
    assert np.isfinite(q_out).all()
    assert rel < 0.15, rel


def test_conv_int8_xla_matches_reference_stride1_and_2():
    """conv_int8_xla (native s8 conv, int32 acc) == the fp-emulated oracle.
    ci kept small so the f32 emulation is exact (acc < 2^24)."""
    from leftrefill_tpu.ops.quant import conv_int8_xla

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 12, 96).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 96, 64).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    wq, ws = quantize_weight(w, axis=-1)

    ref = np.asarray(conv3x3_int8_reference(x, wq, ws, bias))
    got = np.asarray(conv_int8_xla(x, wq, ws, bias, out_dtype=jnp.float32))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-5)

    # stride 2: compare against the same emulation with strided fp conv
    got2 = np.asarray(
        conv_int8_xla(x, wq, ws, bias, strides=(2, 2), out_dtype=jnp.float32)
    )
    from leftrefill_tpu.ops.quant import quantize_activation

    xq, sx = quantize_activation(x)
    ref2 = jax.lax.conv_general_dilated(
        xq.astype(jnp.float32), wq.astype(jnp.float32), (2, 2),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) * (sx * np.asarray(ws)) + np.asarray(bias)
    np.testing.assert_allclose(got2, np.asarray(ref2), atol=1e-4, rtol=1e-5)


def test_quant_downsample_close_to_fp(monkeypatch):
    """The quantized stride-2 Downsample conv (both the dequant fallback and
    the gated XLA-int8 path) stays close to the fp Downsample."""
    from leftrefill_tpu.models.unet import Downsample

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 16, 24, 128).astype(np.float32))
    fp = Downsample(128, dtype=jnp.float32)
    params = fp.init(jax.random.PRNGKey(0), x)["params"]
    fp_out = np.asarray(fp.apply({"params": params}, x))

    q = Downsample(128, dtype=jnp.float32, quant=True)
    q_struct = jax.eval_shape(q.init, jax.random.PRNGKey(0), x)["params"]
    qparams = quantize_params_like(q_struct, params)
    assert qparams["op"]["kernel"].dtype == jnp.int8
    assert fp_out.shape == (1, 8, 12, 128)

    for flag in ("0", "1"):
        monkeypatch.setenv("LEFTREFILL_INT8_XLA_CONV", flag)
        q_out = np.asarray(q.apply({"params": qparams}, x))
        assert q_out.shape == fp_out.shape
        rel = np.abs(q_out - fp_out).max() / np.abs(fp_out).max()
        assert rel < 0.05, (flag, rel)

def test_ln_quant_rowwise_matches_unfused():
    """ln_quant_rowwise == LayerNormF32 -> quantize_activation_rowwise (the
    fused path quantizes from the fp32 normalize, so allow 1 int8 LSB)."""
    from leftrefill_tpu.ops.quant import ln_quant_rowwise, quantize_activation_rowwise

    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    x = jax.random.normal(ks[0], (2, 256, 320), jnp.float32).astype(jnp.bfloat16)
    g = 1.0 + 0.1 * jax.random.normal(ks[1], (320,), jnp.float32)
    b = 0.1 * jax.random.normal(ks[2], (320,), jnp.float32)

    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, -1, keepdims=True)
    v = jnp.mean((xf - m) ** 2, -1, keepdims=True)
    ref = ((xf - m) * jax.lax.rsqrt(v + 1e-5) * g + b).astype(jnp.bfloat16)
    rq, rs = quantize_activation_rowwise(ref)

    with pltpu.force_tpu_interpret_mode():
        xn, xq, sc = ln_quant_rowwise(x, g, b)
    assert xn.dtype == jnp.bfloat16 and xq.dtype == jnp.int8
    assert sc.shape == (2, 256, 1)
    np.testing.assert_allclose(
        np.asarray(xn, np.float32), np.asarray(ref, np.float32), atol=0.03, rtol=0.02
    )
    deq_f = np.asarray(xq, np.float32) * np.asarray(sc)
    deq_r = np.asarray(rq, np.float32) * np.asarray(rs)
    scale_mag = np.abs(np.asarray(ref, np.float32)).max()
    assert np.abs(deq_f - deq_r).max() < 0.02 * scale_mag + 2.0 / 127.0 * scale_mag


@pytest.mark.slow
def test_transformer_block_lnq_matches_unfused(monkeypatch):
    """BasicTransformerBlock int8 with the fused LN+quant prenorms
    (LEFTREFILL_FUSED_LNQ=1) == the unfused chain, identical param tree."""
    import leftrefill_tpu.ops.conv as conv_mod
    from leftrefill_tpu.models.unet import BasicTransformerBlock
    from leftrefill_tpu.ops.quant import quantize_params_like

    monkeypatch.setattr(conv_mod, "on_tpu", lambda: True)
    b, n, c = 1, 64, 128
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, n, c).astype(np.float32), jnp.bfloat16)
    ctx = jnp.asarray(rng.randn(b, 77, 96).astype(np.float32), jnp.bfloat16)
    blk = BasicTransformerBlock(
        dim=c, n_heads=4, d_head=32, context_dim=96, dtype=jnp.bfloat16, quant=True
    )
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("LEFTREFILL_FUSED_LNQ", "1")
        params = blk.init(jax.random.PRNGKey(0), x, ctx)["params"]
        q_struct = jax.eval_shape(blk.init, jax.random.PRNGKey(0), x, ctx)["params"]
        qp = quantize_params_like(q_struct, jax.tree.map(np.asarray, params))
        fused = np.asarray(blk.apply({"params": qp}, x, ctx), np.float32)

        monkeypatch.setenv("LEFTREFILL_FUSED_LNQ", "0")
        p2 = blk.init(jax.random.PRNGKey(0), x, ctx)["params"]
        assert jax.tree_util.tree_structure(p2) == jax.tree_util.tree_structure(params)
        unfused = np.asarray(blk.apply({"params": qp}, x, ctx), np.float32)
    rel = np.abs(fused - unfused).max() / max(np.abs(unfused).max(), 1e-6)
    assert rel < 0.05, rel


@pytest.mark.slow
def test_spatial_transformer_gnq_matches_unfused(monkeypatch):
    """SpatialTransformer int8 with the fused GN+quant proj_in prologue ==
    the unfused chain, identical param tree (norm/{scale,bias} preserved)."""
    import leftrefill_tpu.ops.conv as conv_mod
    from leftrefill_tpu.models.unet import SpatialTransformer
    from leftrefill_tpu.ops.quant import quantize_params_like

    monkeypatch.setattr(conv_mod, "on_tpu", lambda: True)
    b, h, w, c = 1, 8, 16, 128
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32), jnp.bfloat16)
    ctx = jnp.asarray(rng.randn(b, 77, 96).astype(np.float32), jnp.bfloat16)
    st = SpatialTransformer(
        in_channels=c, n_heads=4, d_head=32, depth=1, context_dim=96,
        dtype=jnp.bfloat16, quant=True,
    )
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("LEFTREFILL_FUSED_LNQ", "1")
        params = st.init(jax.random.PRNGKey(0), x, ctx)["params"]
        assert "scale" in params["norm"] and "bias" in params["norm"]
        q_struct = jax.eval_shape(st.init, jax.random.PRNGKey(0), x, ctx)["params"]
        qp = quantize_params_like(q_struct, jax.tree.map(np.asarray, params))
        fused = np.asarray(st.apply({"params": qp}, x, ctx), np.float32)

        monkeypatch.setenv("LEFTREFILL_FUSED_LNQ", "0")
        p2 = st.init(jax.random.PRNGKey(0), x, ctx)["params"]
        assert jax.tree_util.tree_structure(p2) == jax.tree_util.tree_structure(params)
        unfused = np.asarray(st.apply({"params": qp}, x, ctx), np.float32)
    rel = np.abs(fused - unfused).max() / max(np.abs(unfused).max(), 1e-6)
    assert rel < 0.05, rel


@pytest.mark.slow
def test_unet_int8_all_fusions_match_unfused(monkeypatch):
    """Full tiny-UNet int8 forward with both surviving fusion gates ON
    (fused GN+SiLU+quant+conv ResBlock prologues, LN/GN+quant prenorms)
    == both OFF, within quantization rounding.  The integration safety net
    for the fused-kernel dispatch."""
    import leftrefill_tpu.ops.conv as conv_mod
    from leftrefill_tpu.models.unet import UNetModel
    from leftrefill_tpu.ops.quant import quantize_params_like

    monkeypatch.setattr(conv_mod, "on_tpu", lambda: True)
    m = UNetModel(
        model_channels=128, num_res_blocks=1, attention_resolutions=(1, 2),
        channel_mult=(1, 2), num_head_channels=32, context_dim=96,
        transformer_depth=1, dtype=jnp.bfloat16, quant=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32, 9), jnp.bfloat16)
    t = jnp.array([5], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 96), jnp.bfloat16)
    flags = ("LEFTREFILL_FUSED_LNQ", "LEFTREFILL_FUSED_RES")
    with pltpu.force_tpu_interpret_mode():
        for f in flags:
            monkeypatch.setenv(f, "1")
        params = m.init(jax.random.PRNGKey(2), x, t, ctx)["params"]
        from tests.test_tasks import unzero_kernels

        params = unzero_kernels(jax.tree.map(np.asarray, params))
        q_struct = jax.eval_shape(m.init, jax.random.PRNGKey(2), x, t, ctx)["params"]
        qp = quantize_params_like(q_struct, params)
        fused = np.asarray(m.apply({"params": qp}, x, t, ctx), np.float32)
        for f in flags:
            monkeypatch.setenv(f, "0")
        p2 = m.init(jax.random.PRNGKey(2), x, t, ctx)["params"]
        assert jax.tree_util.tree_structure(p2) == jax.tree_util.tree_structure(
            jax.tree.map(jnp.asarray, params)
        )
        unfused = np.asarray(m.apply({"params": qp}, x, t, ctx), np.float32)
    assert np.isfinite(fused).all() and np.isfinite(unfused).all()
    rel = np.abs(fused - unfused).max() / max(np.abs(unfused).max(), 1e-6)
    assert rel < 0.08, rel


@pytest.mark.slow
def test_multiview_block_int8_lnq_matches_unfused(monkeypatch):
    """MultiViewBasicTransformerBlock int8 with the fused LN+quant prenorms
    == the unfused chain (the multiview e2e int8 variant's core block)."""
    import leftrefill_tpu.ops.conv as conv_mod
    from leftrefill_tpu.models.multiview import MultiViewBasicTransformerBlock
    from leftrefill_tpu.ops.quant import quantize_params_like

    monkeypatch.setattr(conv_mod, "on_tpu", lambda: True)
    bv, hw, c = 2, 64, 128  # 2 views of one scene
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(bv, hw, c).astype(np.float32), jnp.bfloat16)
    ctx = jnp.asarray(rng.randn(bv, 77, 96).astype(np.float32), jnp.bfloat16)
    blk = MultiViewBasicTransformerBlock(
        dim=c, n_heads=4, d_head=32, context_dim=96, dtype=jnp.bfloat16,
        quant=True, view_num=2,
    )
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("LEFTREFILL_FUSED_LNQ", "1")
        params = blk.init(jax.random.PRNGKey(0), x, ctx)["params"]
        q_struct = jax.eval_shape(blk.init, jax.random.PRNGKey(0), x, ctx)["params"]
        qp = quantize_params_like(q_struct, jax.tree.map(np.asarray, params))
        fused = np.asarray(blk.apply({"params": qp}, x, ctx), np.float32)
        monkeypatch.setenv("LEFTREFILL_FUSED_LNQ", "0")
        unfused = np.asarray(blk.apply({"params": qp}, x, ctx), np.float32)
    rel = np.abs(fused - unfused).max() / max(np.abs(unfused).max(), 1e-6)
    assert rel < 0.05, rel


def test_dense_int8_res_mom_matches_unfused_and_stats():
    """dense_int8_res_mom == dense_int8 + res, and its [B,4,N] epilogue
    stats (Σ, Σ², min, max) match the written output exactly.  The kernel is
    the SpatialTransformer proj_out site (attention.py:405-419); the stats
    output is retained even though its downstream consumer chain
    (LEFTREFILL_CONV_MOMENTS) was removed — see models/unet.py."""
    from leftrefill_tpu.ops.quant import (
        _plan_dense_rows,
        dense_int8_res_mom,
        quantize_activation_rowwise,
    )

    b, r, k, n = 2, 256, 128, 128
    assert _plan_dense_rows(r, k, n) is not None
    ks = jax.random.split(jax.random.PRNGKey(44), 4)
    x = jax.random.normal(ks[0], (b, r, k), jnp.float32)
    wt = jax.random.normal(ks[1], (k, n), jnp.float32) * 0.05
    wq, ws = quantize_weight(wt)
    bias = 0.1 * jax.random.normal(ks[2], (n,), jnp.float32)
    res = jax.random.normal(ks[3], (b, r, n), jnp.bfloat16)

    xq, sx = quantize_activation_rowwise(x.reshape(b * r, k))
    xq, sx = xq.reshape(b, r, k), sx.reshape(b, r, 1)
    with pltpu.force_tpu_interpret_mode():
        out, mom = dense_int8_res_mom(xq, sx, wq, ws, bias, res)
        base = dense_int8(
            xq.reshape(b * r, k), sx.reshape(b * r, 1), wq, ws, bias,
            out_dtype=jnp.float32,
        ).reshape(b, r, n)
    of = np.asarray(out, np.float32)
    np.testing.assert_allclose(
        of, np.asarray(base) + np.asarray(res, np.float32), atol=0.06, rtol=0.03
    )
    m = np.asarray(mom, np.float64)
    of64 = of.astype(np.float64)
    np.testing.assert_allclose(m[:, 0], of64.sum(1), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(m[:, 1], (of64 * of64).sum(1), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(m[:, 2], of64.min(1), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(m[:, 3], of64.max(1), rtol=1e-3, atol=1e-4)
