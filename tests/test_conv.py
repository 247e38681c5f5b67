"""Pallas 3x3 conv kernel tests (interpret mode on CPU; the same kernel
compiles on TPU — hardware perf is measured by bench/verify drives).
Reference semantics: torch Conv2d(k=3, s=1, p=1) == lax.conv NHWC/HWIO, the
conv used everywhere in openaimodel.py:162-274 and model.py:453-654."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from leftrefill_tpu.ops.conv import (
    _pick_blocks,
    _plan,
    _xla_conv,
    conv3x3_apply,
    conv3x3_op,
    conv3x3_qualifies,
)


@pytest.mark.parametrize(
    "b,h,w,ci,co",
    [
        (2, 16, 32, 128, 64),   # multi-block ci/co path
        (1, 8, 16, 320, 160),   # UNet-ish channels, tiny spatial
        (1, 16, 16, 64, 128),   # w == blk_w edge
    ],
)
def test_conv_pallas_matches_xla(b, h, w, ci, co):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (b, h, w, ci), jnp.float32)
    wk = jax.random.normal(ks[1], (3, 3, ci, co), jnp.float32) * 0.05
    bias = jax.random.normal(ks[2], (co,), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(conv3x3_op(x, wk, bias))
    ref = np.asarray(_xla_conv(x, wk, bias))
    assert np.abs(out - ref).max() < 1e-4


def test_conv_vjp_matches_xla():
    """The custom VJP (XLA-conv backward) must match differentiating the
    reference conv directly."""
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    x = jax.random.normal(ks[0], (1, 8, 16, 128), jnp.float32)
    wk = jax.random.normal(ks[1], (3, 3, 128, 64), jnp.float32) * 0.05
    bias = jax.random.normal(ks[2], (64,), jnp.float32)
    g = jax.random.normal(ks[3], (1, 8, 16, 64), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        _, vjp = jax.vjp(conv3x3_op, x, wk, bias)
        dx, dw, db = vjp(g)
    _, vjp_r = jax.vjp(_xla_conv, x, wk, bias)
    for got, want, name in zip((dx, dw, db), vjp_r(g), ("dx", "dw", "db")):
        err = np.abs(np.asarray(got) - np.asarray(want)).max()
        assert err < 1e-4, f"{name}: {err}"


def test_conv_dispatcher_xla_on_cpu():
    """On CPU the dispatcher must take the XLA path (no TPU)."""
    x = jnp.ones((1, 8, 8, 16))
    wk = jnp.ones((3, 3, 16, 8)) * 0.1
    bias = jnp.zeros((8,))
    out = conv3x3_apply(x, wk, bias)  # must not trip the Pallas path
    assert out.shape == (1, 8, 8, 8)


def test_plan_unet_shapes():
    """Every UNet conv shape must get a Mosaic-aligned block plan (channel
    blocks are 128-multiples or the full dim; 960-ch skip concats zero-pad to
    1024); the 9-channel stem must not qualify (XLA fallback)."""
    for shp in [
        (64, 128, 320, 320), (64, 128, 960, 320), (32, 64, 640, 640),
        (32, 64, 1920, 640), (16, 32, 1280, 1280), (8, 16, 2560, 1280),
    ]:
        plan = _plan(*shp)
        assert plan is not None, shp
        (bw, bci, bco), ci_eff = plan
        h, w, ci, co = shp
        assert w % bw == 0 and ci_eff % bci == 0 and co % bco == 0
        assert bci == ci_eff or bci % 128 == 0
        assert bco == co or bco % 128 == 0
    assert not conv3x3_qualifies(64, 128, 9, 320)


@pytest.mark.parametrize("ci", [96, 192])
def test_conv_channel_padding_path(ci):
    """Ci not 128-aligned takes the zero-padded plan and stays exact."""
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    x = jax.random.normal(ks[0], (1, 8, 16, ci), jnp.float32)
    wk = jax.random.normal(ks[1], (3, 3, ci, 128), jnp.float32) * 0.05
    bias = jax.random.normal(ks[2], (128,), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(conv3x3_op(x, wk, bias))
    ref = np.asarray(_xla_conv(x, wk, bias))
    assert np.abs(out - ref).max() < 1e-4


def test_conv3x3_module_matches_nn_conv():
    """The Conv3x3 flax module must equal nn.Conv (same params, same math) —
    the param layout invariant the checkpoint converter relies on."""
    from flax import linen as nn

    from leftrefill_tpu.models.unet import Conv3x3

    m = Conv3x3(features=24, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16), jnp.float32)
    params = m.init(jax.random.PRNGKey(1), x)["params"]
    assert set(params.keys()) == {"kernel", "bias"}
    ref_conv = nn.Conv(
        24, kernel_size=(3, 3), padding=((1, 1), (1, 1)), dtype=jnp.float32
    )
    out = m.apply({"params": params}, x)
    ref = ref_conv.apply({"params": params}, x)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-5
