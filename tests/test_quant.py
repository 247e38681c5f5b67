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


@pytest.mark.parametrize("kind", ["copy3", "single", "single_copad"])
def test_int8_conv_res_epilogue_matches_separate_add(kind):
    """The fused-residual conv epilogue (res=...) == conv then a separate add,
    for both kernels, incl. the output-channel-padded single plan."""
    from leftrefill_tpu.ops.quant import (
        _plan_int8,
        _plan_int8_single,
        conv3x3_int8_copy3_pre,
        conv3x3_int8_single_pre,
    )

    co = 96 if kind == "single_copad" else 128
    b, h, w, c = 1, 16, 32, 128
    ks = jax.random.split(jax.random.PRNGKey(31), 3)
    x = jax.random.normal(ks[0], (b, h, w, c), jnp.float32)
    wt = jax.random.normal(ks[1], (3, 3, c, co), jnp.float32) * 0.05
    res = jax.random.normal(ks[2], (b, h, w, co), jnp.float32)
    bias = jnp.zeros((co,), jnp.float32)
    wq, ws = quantize_weight(wt)
    xq, sx = quantize_activation(x)

    pre = conv3x3_int8_copy3_pre if kind == "copy3" else conv3x3_int8_single_pre
    plan = (
        _plan_int8(h, w, c, co, res=True)
        if kind == "copy3"
        else _plan_int8_single(h, w, c, co, res=True)
    )
    assert plan is not None
    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(pre(xq, sx, wq, ws, bias, jnp.float32))
        fused = np.asarray(pre(xq, sx, wq, ws, bias, jnp.float32, res=res))
    np.testing.assert_allclose(fused, base + np.asarray(res), atol=1e-5, rtol=1e-5)


def test_gn_silu_conv_res_matches_separate_add():
    """gn_silu_conv3x3_int8(res=skip) == the same call plus a separate add."""
    from leftrefill_tpu.ops.quant import gn_silu_conv3x3_int8

    b, h, w, c, co = 2, 16, 32, 128, 128
    ks = jax.random.split(jax.random.PRNGKey(32), 6)
    x = jax.random.normal(ks[0], (b, h, w, c), jnp.float32)
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (c,), jnp.float32)
    beta = 0.1 * jax.random.normal(ks[2], (c,), jnp.float32)
    wt = jax.random.normal(ks[3], (3, 3, c, co), jnp.float32) * 0.05
    bias = jax.random.normal(ks[4], (co,), jnp.float32) * 0.1
    emb = jax.random.normal(ks[5], (b, c), jnp.float32)
    res = jax.random.normal(jax.random.PRNGKey(33), (b, h, w, co), jnp.float32)
    wq, ws = quantize_weight(wt)

    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(
            gn_silu_conv3x3_int8(
                x, gamma, beta, wq, ws, bias, num_groups=32, emb=emb,
                out_dtype=jnp.float32,
            )
        )
        fused = np.asarray(
            gn_silu_conv3x3_int8(
                x, gamma, beta, wq, ws, bias, num_groups=32, emb=emb,
                out_dtype=jnp.float32, res=res,
            )
        )
    np.testing.assert_allclose(fused, base + np.asarray(res), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("channels", [(128, 128), (128, 256)])
@pytest.mark.slow
def test_resblock_fused_resadd_matches_unfused(monkeypatch, channels):
    """ResBlock with the fused-residual epilogue (LEFTREFILL_FUSED_RESADD=1)
    == the same block with a separate skip+h add, on the Pallas int8 path
    (on_tpu monkeypatched, interpret mode), for identity and 1x1-conv skips.
    The param tree must be identical so checkpoints stay interchangeable."""
    import leftrefill_tpu.ops.conv as conv_mod
    from leftrefill_tpu.models.unet import ResBlock

    monkeypatch.setattr(conv_mod, "on_tpu", lambda: True)
    in_ch, out_ch = channels
    b, h, w = 1, 16, 32
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(b, h, w, in_ch).astype(np.float32), jnp.bfloat16)
    emb = jnp.asarray(rng.randn(b, 64).astype(np.float32), jnp.bfloat16)

    block = ResBlock(out_channels=out_ch, dtype=jnp.bfloat16, quant=True)
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("LEFTREFILL_FUSED_RESADD", "1")
        params = block.init(jax.random.PRNGKey(0), x, emb)["params"]
        # quantize the fp32 int8-site kernels the way quantize_params_like does
        from leftrefill_tpu.ops.quant import quantize_params_like

        q_struct = jax.eval_shape(block.init, jax.random.PRNGKey(0), x, emb)["params"]
        qp = quantize_params_like(q_struct, jax.tree.map(np.asarray, params))
        fused = np.asarray(block.apply({"params": qp}, x, emb), np.float32)

        monkeypatch.setenv("LEFTREFILL_FUSED_RESADD", "0")
        p2 = block.init(jax.random.PRNGKey(0), x, emb)["params"]
        assert jax.tree_util.tree_structure(p2) == jax.tree_util.tree_structure(params)
        unfused = np.asarray(block.apply({"params": qp}, x, emb), np.float32)

    rel = np.abs(fused - unfused).max() / max(np.abs(unfused).max(), 1e-6)
    assert rel < 0.03, rel  # bf16 epilogue rounding only


def test_geglu_int8_res_matches_separate_add():
    """geglu_fused_int8(res=...) == the same call plus a separate add."""
    from leftrefill_tpu.ops.mlp import _plan, geglu_fused_int8

    r, din, mult = 256, 128, 4
    inner, dout = din * mult, din
    assert _plan(r, din, inner, dout, x_elt=1, w_elt=1, res=True) is not None
    ks = jax.random.split(jax.random.PRNGKey(13), 6)
    x = jax.random.normal(ks[0], (r, din), jnp.float32)
    w1 = jax.random.normal(ks[1], (din, 2 * inner), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[2], (2 * inner,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[3], (inner, dout), jnp.float32) * 0.05
    b2 = jax.random.normal(ks[4], (dout,), jnp.float32) * 0.1
    res = jax.random.normal(ks[5], (r, dout), jnp.float32)
    w1q, s1 = quantize_weight(w1)
    w2q, s2 = quantize_weight(w2)
    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(
            geglu_fused_int8(x, w1q, s1, b1, w2q, s2, b2, out_dtype=jnp.float32)
        )
        fused = np.asarray(
            geglu_fused_int8(
                x, w1q, s1, b1, w2q, s2, b2, out_dtype=jnp.float32, res=res
            )
        )
    np.testing.assert_allclose(fused, base + np.asarray(res), atol=1e-5, rtol=1e-5)


def test_geglu_fused_res_matches_and_differentiates():
    """bf16 geglu_fused_res == geglu_fused + res; custom VJP passes the
    residual cotangent straight through (training path of the fused FF)."""
    from leftrefill_tpu.ops.mlp import _plan, geglu_fused, geglu_fused_res

    r, din, mult = 256, 128, 4
    inner, dout = din * mult, din
    assert _plan(r, din, inner, dout, x_elt=2, w_elt=2, res=True) is not None
    ks = jax.random.split(jax.random.PRNGKey(14), 6)
    x = jax.random.normal(ks[0], (r, din), jnp.float32)
    w1 = jax.random.normal(ks[1], (din, 2 * inner), jnp.float32) * 0.05
    b1 = jax.random.normal(ks[2], (2 * inner,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[3], (inner, dout), jnp.float32) * 0.05
    b2 = jax.random.normal(ks[4], (dout,), jnp.float32) * 0.1
    res = jax.random.normal(ks[5], (r, dout), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(geglu_fused(x, w1, b1, w2, b2))
        fused = np.asarray(geglu_fused_res(x, w1, b1, w2, b2, res))
    np.testing.assert_allclose(fused, base + np.asarray(res), atol=1e-5, rtol=1e-5)

    with pltpu.force_tpu_interpret_mode():
        gx, gres = jax.grad(
            lambda xx, rr: jnp.sum(geglu_fused_res(xx, w1, b1, w2, b2, rr) ** 2),
            argnums=(0, 1),
        )(x, res)
    with pltpu.force_tpu_interpret_mode():
        gx_ref, gres_ref = jax.grad(
            lambda xx, rr: jnp.sum((geglu_fused(xx, w1, b1, w2, b2) + rr) ** 2),
            argnums=(0, 1),
        )(x, res)
    np.testing.assert_allclose(np.asarray(gres), np.asarray(gres_ref), atol=1e-4, rtol=1e-4)
    rel = np.abs(np.asarray(gx) - np.asarray(gx_ref)).max() / max(
        np.abs(np.asarray(gx_ref)).max(), 1e-6
    )
    assert rel < 0.05, rel


@pytest.mark.parametrize("mode", ["dy3"])
def test_int8_conv_tap_modes_match_sum9(mode):
    """The deep-K tap variant (dy3: K=3*blk_ci) is bit-identical to sum9 —
    same int32 accumulation, different dot grouping.  ("concat" K=9*blk_ci
    was removed: 9x im2col buffer blew scoped VMEM at L0, r4 chain.)"""
    from leftrefill_tpu.ops import quant as Q

    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    x = jax.random.normal(ks[0], (2, 16, 32, 128), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, 128, 128), jnp.float32) * 0.05
    b = jax.random.normal(ks[2], (128,), jnp.float32)
    wq, ws = quantize_weight(w)
    try:
        with pltpu.force_tpu_interpret_mode():
            base = np.asarray(conv3x3_int8(x, wq, ws, b, out_dtype=jnp.float32))
            Q.set_int8_tap_mode(mode)
            out = np.asarray(conv3x3_int8(x, wq, ws, b, out_dtype=jnp.float32))
    finally:
        Q.set_int8_tap_mode("sum9")
    np.testing.assert_array_equal(out, base)


def test_gn_silu_conv_cat2_matches_materialized():
    """gn_silu_conv3x3_int8_cat2 over (x1, x2) == gn_silu_conv3x3_int8 over
    the materialized concat: identical quantized activations (shared joint
    scale), split-kernel conv summed through the fused-res epilogue (one
    extra bf16 rounding of the partial sum)."""
    from leftrefill_tpu.ops.quant import (
        gn_silu_conv3x3_int8,
        gn_silu_conv3x3_int8_cat2,
    )

    ks = jax.random.split(jax.random.PRNGKey(11), 6)
    b, h, w, c1, c2, co = 1, 16, 32, 128, 128, 128
    x1 = jax.random.normal(ks[0], (b, h, w, c1), jnp.float32).astype(jnp.bfloat16)
    x2 = jax.random.normal(ks[1], (b, h, w, c2), jnp.float32).astype(jnp.bfloat16)
    gamma = 1.0 + 0.1 * jax.random.normal(ks[2], (c1 + c2,), jnp.float32)
    beta = 0.1 * jax.random.normal(ks[3], (c1 + c2,), jnp.float32)
    wt = jax.random.normal(ks[4], (3, 3, c1 + c2, co), jnp.float32) * 0.05
    wq, ws = quantize_weight(wt)
    bias = 0.1 * jax.random.normal(ks[5], (co,), jnp.float32)
    emb = 0.1 * jax.random.normal(ks[5], (b, c1 + c2), jnp.float32)
    res = jax.random.normal(ks[0], (b, h, w, co), jnp.float32).astype(jnp.bfloat16)

    with pltpu.force_tpu_interpret_mode():
        ref = np.asarray(
            gn_silu_conv3x3_int8(
                jnp.concatenate([x1, x2], -1), gamma, beta, wq, ws, bias,
                num_groups=32, emb=emb, res=res,
            ),
            np.float32,
        )
        out = np.asarray(
            gn_silu_conv3x3_int8_cat2(
                x1, x2, gamma, beta, wq, ws, bias, num_groups=32, emb=emb, res=res,
            ),
            np.float32,
        )
    rel = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert rel < 0.02, rel


@pytest.mark.slow
def test_resblock_split_cat_matches_materialized(monkeypatch):
    """ResBlock((h, skip)) == ResBlock(cat([h, skip])) on the fused int8 path
    (split-kernel convs + split 1x1 skip), with an identical param tree."""
    import leftrefill_tpu.ops.conv as conv_mod
    from leftrefill_tpu.models.unet import ResBlock
    from leftrefill_tpu.ops.quant import quantize_params_like

    monkeypatch.setattr(conv_mod, "on_tpu", lambda: True)
    b, h, w, c1, c2, out_ch = 1, 16, 32, 128, 128, 128
    rng = np.random.RandomState(9)
    x1 = jnp.asarray(rng.randn(b, h, w, c1).astype(np.float32), jnp.bfloat16)
    x2 = jnp.asarray(rng.randn(b, h, w, c2).astype(np.float32), jnp.bfloat16)
    xc = jnp.concatenate([x1, x2], axis=-1)
    emb = jnp.asarray(rng.randn(b, 64).astype(np.float32), jnp.bfloat16)

    block = ResBlock(out_channels=out_ch, dtype=jnp.bfloat16, quant=True)
    with pltpu.force_tpu_interpret_mode():
        params = block.init(jax.random.PRNGKey(0), xc, emb)["params"]
        p_tup = block.init(jax.random.PRNGKey(0), (x1, x2), emb)["params"]
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
            p_tup
        )
        q_struct = jax.eval_shape(block.init, jax.random.PRNGKey(0), xc, emb)["params"]
        qp = quantize_params_like(q_struct, jax.tree.map(np.asarray, params))
        ref = np.asarray(block.apply({"params": qp}, xc, emb), np.float32)
        out = np.asarray(block.apply({"params": qp}, (x1, x2), emb), np.float32)
    rel = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert rel < 0.03, rel


@pytest.mark.slow
def test_unet_split_cat_plumbing_cpu():
    """On CPU (no Pallas path) the decoder's unmaterialized-cat tuple must be
    materialized inside ResBlock: SPLIT_CAT on/off are bit-identical."""
    import os

    from leftrefill_tpu.models.unet import UNetModel

    m = UNetModel(
        model_channels=64, num_res_blocks=1, attention_resolutions=(2,),
        channel_mult=(1, 2), num_heads=2, context_dim=64,
        transformer_depth=1, dtype=jnp.float32, quant=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32, 9), jnp.float32)
    t = jnp.array([3], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 64), jnp.float32)
    params = m.init(jax.random.PRNGKey(2), x, t, ctx)
    old = os.environ.get("LEFTREFILL_SPLIT_CAT")
    try:
        os.environ["LEFTREFILL_SPLIT_CAT"] = "1"
        a = np.asarray(m.apply(params, x, t, ctx))
        os.environ["LEFTREFILL_SPLIT_CAT"] = "0"
        b_ = np.asarray(m.apply(params, x, t, ctx))
    finally:
        if old is None:
            os.environ.pop("LEFTREFILL_SPLIT_CAT", None)
        else:
            os.environ["LEFTREFILL_SPLIT_CAT"] = old
    np.testing.assert_array_equal(a, b_)


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


@pytest.mark.parametrize("kind", ["copy3", "single"])
def test_int8_conv_emit_moments_matches_output_sums(kind):
    """emit_moments returns the per-channel (Σout, Σout²) of the written
    output, accumulated across the column-block grid."""
    from leftrefill_tpu.ops.quant import (
        conv3x3_int8_copy3_pre,
        conv3x3_int8_single_pre,
    )

    ks = jax.random.split(jax.random.PRNGKey(23), 3)
    b, h, w, ci, co = 2, 16, 32, 128, 128
    xq = jax.random.randint(ks[0], (b, h, w, ci), -7, 8, jnp.int8)
    wq = jax.random.randint(ks[1], (3, 3, ci, co), -7, 8, jnp.int8)
    ws = jnp.full((co,), 1e-2, jnp.float32)
    bias = jax.random.normal(ks[2], (co,), jnp.float32) * 0.1
    sx = jnp.float32(1e-2)
    fn = conv3x3_int8_copy3_pre if kind == "copy3" else conv3x3_int8_single_pre
    with pltpu.force_tpu_interpret_mode():
        out, mom = fn(xq, sx, wq, ws, bias, jnp.float32, emit_moments=True)
        base = fn(xq, sx, wq, ws, bias, jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))
    of = np.asarray(out, np.float64)
    np.testing.assert_allclose(
        np.asarray(mom[:, 0]), of.sum(axis=(1, 2)), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(mom[:, 1]), (of * of).sum(axis=(1, 2)), rtol=1e-4, atol=1e-4
    )


def test_resblock_conv_moments_matches_recompute(monkeypatch):
    """ResBlock with LEFTREFILL_CONV_MOMENTS=1 (second GN consumes the conv1
    epilogue's moments) == the same block recomputing moments from h."""
    import leftrefill_tpu.ops.conv as conv_mod
    from leftrefill_tpu.models.unet import ResBlock
    from leftrefill_tpu.ops.quant import quantize_params_like

    monkeypatch.setattr(conv_mod, "on_tpu", lambda: True)
    b, h, w, c = 1, 16, 32, 128
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32), jnp.bfloat16)
    emb = jnp.asarray(rng.randn(b, 64).astype(np.float32), jnp.bfloat16)
    block = ResBlock(out_channels=c, dtype=jnp.bfloat16, quant=True)
    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setenv("LEFTREFILL_CONV_MOMENTS", "1")
        params = block.init(jax.random.PRNGKey(0), x, emb)["params"]
        q_struct = jax.eval_shape(block.init, jax.random.PRNGKey(0), x, emb)["params"]
        qp = quantize_params_like(q_struct, jax.tree.map(np.asarray, params))
        with_mom = np.asarray(block.apply({"params": qp}, x, emb), np.float32)
        monkeypatch.setenv("LEFTREFILL_CONV_MOMENTS", "0")
        p2 = block.init(jax.random.PRNGKey(0), x, emb)["params"]
        assert jax.tree_util.tree_structure(p2) == jax.tree_util.tree_structure(params)
        without = np.asarray(block.apply({"params": qp}, x, emb), np.float32)
    rel = np.abs(with_mom - without).max() / max(np.abs(without).max(), 1e-6)
    assert rel < 0.03, rel


@pytest.mark.slow
def test_resblock_emit_moments_interface(monkeypatch):
    """ResBlock(emit_moments=True) returns (out, (Σ, Σ²)) on the fused int8
    path with sums matching the actual output, and (out, None) on fp paths.

    Block-output moments are only emittable when the residual add is fused
    into the conv2 epilogue (otherwise the epilogue stats miss the skip add),
    so the contract requires the full fused family ON — the gates shipped
    default-OFF after the r3 family A/B (CLAUDE.md §3b); setenv them here
    like tests/test_dispatch_structure.py does."""
    import leftrefill_tpu.ops.conv as conv_mod
    from leftrefill_tpu.models.unet import ResBlock
    from leftrefill_tpu.ops.quant import quantize_params_like

    monkeypatch.setattr(conv_mod, "on_tpu", lambda: True)
    monkeypatch.setenv("LEFTREFILL_FUSED_RES", "1")
    monkeypatch.setenv("LEFTREFILL_FUSED_RESADD", "1")
    monkeypatch.setenv("LEFTREFILL_CONV_MOMENTS", "1")
    b, h, w, c = 1, 16, 32, 128
    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32), jnp.bfloat16)
    emb = jnp.asarray(rng.randn(b, 64).astype(np.float32), jnp.bfloat16)
    block = ResBlock(out_channels=c, dtype=jnp.bfloat16, quant=True)
    with pltpu.force_tpu_interpret_mode():
        params = block.init(jax.random.PRNGKey(0), x, emb)["params"]
        # fp params: interface returns (out, None)
        out_fp, mom_fp = block.apply(
            {"params": params}, x, emb, emit_moments=True
        )
        assert mom_fp is None
        q_struct = jax.eval_shape(block.init, jax.random.PRNGKey(0), x, emb)["params"]
        qp = quantize_params_like(q_struct, jax.tree.map(np.asarray, params))
        out, mom = block.apply({"params": qp}, x, emb, emit_moments=True)
        base = block.apply({"params": qp}, x, emb)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))
    assert mom is not None
    of = np.asarray(out, np.float64)
    np.testing.assert_allclose(
        np.asarray(mom[0]), of.sum(axis=(1, 2)), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(mom[1]), (of * of).sum(axis=(1, 2)), rtol=1e-3, atol=1e-3
    )


def test_gn_quant_rowwise_moments_matches_recompute():
    """gn_quant_rowwise(moments=(Σ, Σ²)) == recomputing the moments from x."""
    from leftrefill_tpu.ops.quant import gn_quant_rowwise

    ks = jax.random.split(jax.random.PRNGKey(17), 3)
    b, h, w, c = 1, 16, 32, 128
    x = jax.random.normal(ks[0], (b, h, w, c), jnp.float32).astype(jnp.bfloat16)
    g = 1.0 + 0.1 * jax.random.normal(ks[1], (c,), jnp.float32)
    bta = 0.1 * jax.random.normal(ks[2], (c,), jnp.float32)
    xf = np.asarray(x, np.float32)
    mom = (
        jnp.asarray(xf.sum(axis=(1, 2))),
        jnp.asarray((xf * xf).sum(axis=(1, 2))),
    )
    with pltpu.force_tpu_interpret_mode():
        xn0, xq0, sc0 = gn_quant_rowwise(x, g, bta)
        xn1, xq1, sc1 = gn_quant_rowwise(x, g, bta, moments=mom)
    np.testing.assert_allclose(
        np.asarray(xn1, np.float32), np.asarray(xn0, np.float32), atol=0.02, rtol=0.02
    )
    deq0 = np.asarray(xq0, np.float32) * np.asarray(sc0)
    deq1 = np.asarray(xq1, np.float32) * np.asarray(sc1)
    np.testing.assert_allclose(deq1, deq0, atol=0.05, rtol=0.05)


def test_silu_envelope_scale_matches_amax_read():
    """The quant scale computed from the per-channel (min, max) envelope ==
    the full abs-max read of silu(x*a+bb), to fp rounding: |silu| on an
    interval peaks at an endpoint or the interior minimum y*=-1.2785."""
    from leftrefill_tpu.ops.quant import _gn_affine_ab, gn_silu_conv3x3_int8

    ks = jax.random.split(jax.random.PRNGKey(31), 6)
    b, h, w, c, co = 2, 16, 32, 128, 128
    # include negative-heavy and positive-heavy channels so some envelopes
    # straddle y* and some don't
    x = jax.random.normal(ks[0], (b, h, w, c), jnp.float32) * 2.0 - 0.5
    gamma = 1.0 + 0.3 * jax.random.normal(ks[1], (c,), jnp.float32)
    beta = 0.5 * jax.random.normal(ks[2], (c,), jnp.float32)
    m_c = jnp.mean(x, axis=(1, 2))
    q_c = jnp.mean(x * x, axis=(1, 2))
    a, bb = _gn_affine_ab(m_c, q_c, gamma, beta, 32, 1e-5, None, None)
    y = x * a[:, None, None, :] + bb[:, None, None, :]
    amax_read = float(jnp.max(jnp.abs(y * jax.nn.sigmoid(y))))

    lo = jnp.min(x, axis=(1, 2)) * a + bb
    hi = jnp.max(x, axis=(1, 2)) * a + bb
    y_lo, y_hi = jnp.minimum(lo, hi), jnp.maximum(lo, hi)
    s = lambda v: v * jax.nn.sigmoid(v)
    cand = jnp.maximum(jnp.abs(s(y_lo)), jnp.abs(s(y_hi)))
    cand = jnp.where(
        (y_lo <= -1.2784645) & (-1.2784645 <= y_hi),
        jnp.maximum(cand, 0.2784645), cand,
    )
    amax_env = float(jnp.max(cand))
    assert amax_env >= amax_read - 1e-5          # valid (never underestimates)
    assert amax_env <= amax_read * 1.0001 + 1e-5  # and tight (exact to rounding)


@pytest.mark.slow
def test_st_fused_proj_out_emits_stats(monkeypatch):
    """SpatialTransformer int8: the fused proj_out GEMM (+ x_in residual)
    returns output stats matching the actual output, and the output equals
    the unfused path within quantization rounding."""
    import leftrefill_tpu.ops.conv as conv_mod
    from leftrefill_tpu.models.unet import SpatialTransformer
    from leftrefill_tpu.ops.quant import quantize_params_like

    monkeypatch.setattr(conv_mod, "on_tpu", lambda: True)
    b, h, w, c = 1, 16, 32, 128
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32), jnp.bfloat16)
    ctx = jnp.asarray(rng.randn(b, 77, 96).astype(np.float32), jnp.bfloat16)
    st = SpatialTransformer(
        in_channels=c, n_heads=4, d_head=32, depth=1, context_dim=96,
        dtype=jnp.bfloat16, quant=True,
    )
    with pltpu.force_tpu_interpret_mode():
        params = st.init(jax.random.PRNGKey(0), x, ctx)["params"]
        assert "kernel" in params["proj_out"]  # holder keeps the tree
        q_struct = jax.eval_shape(st.init, jax.random.PRNGKey(0), x, ctx)["params"]
        # unzero proj_out so the residual comparison is non-trivial
        params = jax.tree.map(np.asarray, params)
        params["proj_out"]["kernel"] = (
            rng.randn(*params["proj_out"]["kernel"].shape).astype(np.float32) * 0.05
        )
        qp = quantize_params_like(q_struct, params)
        out, mom = st.apply({"params": qp}, x, ctx, emit_moments=True)
    assert mom is not None and len(mom) == 4
    of = np.asarray(out, np.float64).reshape(b, -1, c)
    np.testing.assert_allclose(np.asarray(mom[0]), of.sum(1), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(mom[2]), of.min(1), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mom[3]), of.max(1), rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_gn_silu_conv_cat2_with_moments_matches():
    """cat2 consuming combined (channel-concat) upstream stats == cat2
    computing its own per-part moments/amax."""
    from leftrefill_tpu.ops.quant import gn_silu_conv3x3_int8_cat2

    ks = jax.random.split(jax.random.PRNGKey(41), 6)
    b, h, w, c1, c2, co = 1, 16, 32, 128, 128, 128
    x1 = jax.random.normal(ks[0], (b, h, w, c1), jnp.float32).astype(jnp.bfloat16)
    x2 = jax.random.normal(ks[1], (b, h, w, c2), jnp.float32).astype(jnp.bfloat16)
    gamma = 1.0 + 0.1 * jax.random.normal(ks[2], (c1 + c2,), jnp.float32)
    beta = 0.1 * jax.random.normal(ks[3], (c1 + c2,), jnp.float32)
    wt = jax.random.normal(ks[4], (3, 3, c1 + c2, co), jnp.float32) * 0.05
    wq, ws = quantize_weight(wt)
    bias = 0.1 * jax.random.normal(ks[5], (co,), jnp.float32)

    xf = np.concatenate(
        [np.asarray(x1, np.float32), np.asarray(x2, np.float32)], axis=-1
    )
    mom = (
        jnp.asarray(xf.sum(axis=(1, 2))),
        jnp.asarray((xf * xf).sum(axis=(1, 2))),
        jnp.asarray(xf.min(axis=(1, 2))),
        jnp.asarray(xf.max(axis=(1, 2))),
    )
    with pltpu.force_tpu_interpret_mode():
        base = np.asarray(
            gn_silu_conv3x3_int8_cat2(x1, x2, gamma, beta, wq, ws, bias), np.float32
        )
        with_m = np.asarray(
            gn_silu_conv3x3_int8_cat2(
                x1, x2, gamma, beta, wq, ws, bias, moments=mom
            ),
            np.float32,
        )
    rel = np.abs(with_m - base).max() / max(np.abs(base).max(), 1e-6)
    assert rel < 0.02, rel


@pytest.mark.slow
def test_unet_int8_all_fusions_match_unfused(monkeypatch):
    """Full tiny-UNet int8 forward with the whole fusion family ON
    (split cats, LN/GN+quant prenorms, conv/proj epilogue stats + envelope
    scales, fused residuals) == all fusions OFF, within quantization
    rounding.  The integration safety net for the chained-stats design."""
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
    flags = ("LEFTREFILL_SPLIT_CAT", "LEFTREFILL_FUSED_LNQ",
             "LEFTREFILL_CONV_MOMENTS", "LEFTREFILL_FUSED_RESADD",
             "LEFTREFILL_FUSED_FFRES", "LEFTREFILL_FUSED_RES")
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
