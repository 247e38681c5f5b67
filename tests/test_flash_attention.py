"""Pallas flash-attention kernel tests via interpreter mode (runs on CPU;
the same kernel code compiles on TPU — hardware parity is exercised by the
verify drives and bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from leftrefill_tpu.ops.flash_attention import _xla_reference, flash_attention


@pytest.mark.parametrize("nq,nk", [(256, 256), (512, 512), (256, 512)])
def test_flash_matches_fp32_softmax_reference(nq, nk):
    B, H, D = 2, 3, 64
    key = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(s, (B, H, n, D), jnp.float32)
        for s, n in zip(jax.random.split(key, 3), (nq, nk, nk))
    )
    scale = D**-0.5
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, scale)
    ref = _xla_reference(q, k, v, scale)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-5


def test_flash_large_logits_no_overflow():
    """The clamp guard: amplified logits must stay finite and close to the
    fp32-softmax reference (saturated rows match because softmax saturates
    identically)."""
    B, H, N, D = 1, 2, 256, 64
    key = jax.random.PRNGKey(1)
    # 8x-amplified queries: logit std ~8*sqrt(D)*scale = 8, max-over-keys
    # ~ +30 — an order beyond trained attention, still under the clamp
    q = jax.random.normal(key, (B, H, N, D), jnp.float32) * 8.0
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, N, D), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, N, D), jnp.float32)
    scale = D**-0.5
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(flash_attention(q, k, v, scale))
    assert np.isfinite(out).all()
    ref = np.asarray(_xla_reference(q, k, v, scale))
    assert np.abs(out - ref).max() < 1e-3


def test_flash_all_logits_underflow_is_finite():
    """Advisor r2: a q-row whose every logit is below ~-87 used to give
    l==0 and o = 0/0 = NaN in non-safe mode; the divisor guard must make the
    output finite (degrades to 0) instead."""
    B, H, N, D = 1, 1, 256, 64
    key = jax.random.PRNGKey(7)
    # all logits ~ -8000: exp underflows to exactly 0 for every key
    q = jnp.full((B, H, N, D), -10.0, jnp.float32)
    k = jnp.abs(jax.random.normal(key, (B, H, N, D), jnp.float32)) + 1.0
    v = jax.random.normal(jax.random.fold_in(key, 1), (B, H, N, D), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(flash_attention(q, k, v, 1.0))
    assert np.isfinite(out).all()


def test_flash_gradient_masked_outside_clamp_envelope():
    """Advisor r2: for logits beyond CLAMP the forward is constant in s, so
    d/dq must be ~0 there (ds masked), not the unmasked p*(dp-D)."""
    B, H, N, D = 1, 1, 256, 64
    key = jax.random.PRNGKey(8)
    # one dominant key direction with logits way past CLAMP=75
    q = jnp.abs(jax.random.normal(key, (B, H, N, D), jnp.float32)) + 2.0
    k = jnp.abs(jax.random.normal(jax.random.fold_in(key, 1), (B, H, N, D), jnp.float32)) + 2.0
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, N, D), jnp.float32)
    # logits ~ sum(|q_d| * |k_d|) >= 4*D = 256 >> 75: every score saturates
    with pltpu.force_tpu_interpret_mode():
        gq = jax.grad(
            lambda q: jnp.sum(flash_attention(q, k, v, 1.0) ** 2)
        )(q)
    # all scores clamped -> p uniform & constant in q -> dq == 0
    assert np.abs(np.asarray(gq)).max() < 1e-5


def test_flash_gradients_match_reference():
    """Custom VJP: gradients equal the XLA fp32-softmax attention gradients."""
    B, H, N, D = 1, 2, 256, 64
    key = jax.random.PRNGKey(2)
    q, k, v = (
        jax.random.normal(s, (B, H, N, D), jnp.float32) for s in jax.random.split(key, 3)
    )
    scale = D**-0.5

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(lambda q, k, v: jnp.sum(flash_attention(q, k, v, scale) ** 2), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda q, k, v: jnp.sum(_xla_reference(q, k, v, scale) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-4


@pytest.mark.parametrize("nq,nk", [(256, 384), (384, 256)])
def test_flash_pallas_backward_rectangular(nq, nk):
    """The blockwise Pallas dq/dk/dv kernels (no [N,N] HBM tensor) must match
    the fp32-softmax reference VJP on rectangular shapes."""
    B, H, D = 1, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    q = jax.random.normal(ks[0], (B, H, nq, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, nk, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, nk, D), jnp.float32)
    g = jax.random.normal(ks[3], (B, H, nq, D), jnp.float32)
    scale = D**-0.5
    with pltpu.force_tpu_interpret_mode():
        _, vjp = jax.vjp(lambda a, b, c: flash_attention(a, b, c, scale), q, k, v)
        dq, dk, dv = vjp(g)
    _, vjp_r = jax.vjp(lambda a, b, c: _xla_reference(a, b, c, scale), q, k, v)
    for got, want, name in zip((dq, dk, dv), vjp_r(g), ("dq", "dk", "dv")):
        err = np.abs(np.asarray(got) - np.asarray(want)).max()
        assert err < 1e-5, f"{name}: {err}"


def test_flash_backward_bf16():
    """bf16 inputs: grads returned in bf16, close to the fp32 reference."""
    B, H, N, D = 1, 1, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(4), 4)
    qf = jax.random.normal(ks[0], (B, H, N, D), jnp.float32)
    kf = jax.random.normal(ks[1], (B, H, N, D), jnp.float32)
    vf = jax.random.normal(ks[2], (B, H, N, D), jnp.float32)
    g = jax.random.normal(ks[3], (B, H, N, D), jnp.float32)
    scale = D**-0.5
    q, k, v = (a.astype(jnp.bfloat16) for a in (qf, kf, vf))
    with pltpu.force_tpu_interpret_mode():
        _, vjp = jax.vjp(lambda a, b, c: flash_attention(a, b, c, scale), q, k, v)
        dq, dk, dv = vjp(g.astype(jnp.bfloat16))
    assert dq.dtype == jnp.bfloat16 and dk.dtype == jnp.bfloat16
    _, vjp_r = jax.vjp(lambda a, b, c: _xla_reference(a, b, c, scale), qf, kf, vf)
    for got, want, name in zip((dq, dk, dv), vjp_r(g), ("dq", "dk", "dv")):
        err = np.abs(np.asarray(got, np.float32) - np.asarray(want)).max()
        assert err < 0.1, f"{name}: {err}"


def test_flash_safe_softmax_mode():
    """Debug mode (row-max shift) must be exact for logits far beyond the
    clamp, forward and backward."""
    from leftrefill_tpu.ops import flash_attention as fa

    B, H, N, D = 1, 1, 256, 64
    key = jax.random.PRNGKey(7)
    q = jax.random.normal(key, (B, H, N, D), jnp.float32) * 40.0  # logits ~+150
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, N, D), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, N, D), jnp.float32)
    g = jax.random.normal(jax.random.fold_in(key, 3), (B, H, N, D), jnp.float32)
    scale = D**-0.5
    fa.set_safe_softmax(True)
    try:
        with pltpu.force_tpu_interpret_mode():
            out, vjp = jax.vjp(lambda a, b, c: flash_attention(a, b, c, scale), q, k, v)
            grads = vjp(g)
        ref, vjp_r = jax.vjp(lambda a, b, c: _xla_reference(a, b, c, scale), q, k, v)
        assert np.isfinite(np.asarray(out)).all()
        assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-4
        for got, want in zip(grads, vjp_r(g)):
            assert np.abs(np.asarray(got) - np.asarray(want)).max() < 1e-3
    finally:
        fa.set_safe_softmax(False)


def test_flash_backward_non_512_multiple_nq():
    """Regression: nq=640 (multiple of 128, NOT of the 512 dkv chunk) must
    not drop the tail q rows from dk/dv (review finding, r2)."""
    B, H, NQ, NK, D = 1, 1, 640, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(9), 4)
    q = jax.random.normal(ks[0], (B, H, NQ, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, NK, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, NK, D), jnp.float32)
    g = jax.random.normal(ks[3], (B, H, NQ, D), jnp.float32)
    scale = D**-0.5
    with pltpu.force_tpu_interpret_mode():
        _, vjp = jax.vjp(lambda a, b, c: flash_attention(a, b, c, scale), q, k, v)
        dq, dk, dv = vjp(g)
    _, vjp_r = jax.vjp(lambda a, b, c: _xla_reference(a, b, c, scale), q, k, v)
    for got, want, name in zip((dq, dk, dv), vjp_r(g), ("dq", "dk", "dv")):
        err = np.abs(np.asarray(got) - np.asarray(want)).max()
        assert err < 1e-5, f"{name}: {err}"


def test_flash_exp2_mode_matches_reference():
    """LEFTREFILL_FLASH_EXP2 (log2-domain softmax): exp2(s*log2e) == exp(s)
    mathematically; forward and every VJP input must match the fp32-softmax
    reference to the same tolerance as the default mode — incl. the dk
    log2e correction at the dkv accumulator write."""
    from leftrefill_tpu.ops import flash_attention as fa

    B, H, N, D = 1, 2, 256, 64
    key = jax.random.PRNGKey(11)
    q, k, v = (
        jax.random.normal(s, (B, H, N, D), jnp.float32)
        for s in jax.random.split(key, 3)
    )
    scale = D**-0.5
    fa.set_exp2(True)
    try:
        with pltpu.force_tpu_interpret_mode():
            out, vjp = jax.vjp(lambda a, b, c: flash_attention(a, b, c, scale), q, k, v)
            g = vjp(jnp.ones_like(out))
    finally:
        fa.set_exp2(False)
    ref, vjp_r = jax.vjp(lambda a, b, c: _xla_reference(a, b, c, scale), q, k, v)
    g_r = vjp_r(jnp.ones_like(ref))
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-5
    for a, b, name in zip(g, g_r, "qkv"):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-4, f"d{name}"


@pytest.mark.parametrize("mode", ["default", "safe", "exp2"])
def test_flash_kvchunk_forward_and_backward(monkeypatch, mode):
    """Streaming-K/V path (nk beyond the resident budget — the V=4 multiview
    joint attention): shrink the budget so a small shape takes the chunked
    kernels, and check forward + every VJP input against the fp32-softmax
    reference in all three softmax modes."""
    from leftrefill_tpu.ops import flash_attention as fa

    monkeypatch.setattr(fa, "KV_RESIDENT_MAX", 256)
    monkeypatch.setattr(fa, "KV_CHUNK", 128)
    assert fa._kv_chunk_for(512) == 128

    B, H, NQ, NK, D = 1, 2, 256, 512, 64
    ks = jax.random.split(jax.random.PRNGKey(21), 4)
    q = jax.random.normal(ks[0], (B, H, NQ, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, NK, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, NK, D), jnp.float32)
    g = jax.random.normal(ks[3], (B, H, NQ, D), jnp.float32)
    scale = D**-0.5
    if mode == "safe":
        fa.set_safe_softmax(True)
    elif mode == "exp2":
        fa.set_exp2(True)
    try:
        with pltpu.force_tpu_interpret_mode():
            out, vjp = jax.vjp(lambda a, b, c: flash_attention(a, b, c, scale), q, k, v)
            grads = vjp(g)
    finally:
        fa.set_safe_softmax(False)
        fa.set_exp2(False)
    ref, vjp_r = jax.vjp(lambda a, b, c: _xla_reference(a, b, c, scale), q, k, v)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 1e-5
    for got, want, name in zip(grads, vjp_r(g), ("dq", "dk", "dv")):
        err = np.abs(np.asarray(got) - np.asarray(want)).max()
        assert err < 1e-4, f"{name}: {err}"


def test_flash_kvchunk_matches_resident_path(monkeypatch):
    """The chunked forward must be bit-close to the resident-KV forward on
    the same inputs (both are exact clamp-guard softmax)."""
    from leftrefill_tpu.ops import flash_attention as fa

    B, H, NQ, NK, D = 1, 1, 256, 512, 64
    ks = jax.random.split(jax.random.PRNGKey(22), 3)
    q = jax.random.normal(ks[0], (B, H, NQ, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, NK, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, NK, D), jnp.float32)
    scale = D**-0.5
    with pltpu.force_tpu_interpret_mode():
        o_res, l_res = fa._flash_forward(q, k, v, scale)
        monkeypatch.setattr(fa, "KV_RESIDENT_MAX", 256)
        monkeypatch.setattr(fa, "KV_CHUNK", 128)
        o_chk, l_chk = fa._flash_forward(q, k, v, scale)
    assert np.abs(np.asarray(o_chk) - np.asarray(o_res)).max() < 1e-6
    assert np.abs(np.asarray(l_chk) - np.asarray(l_res)).max() < 1e-5


def test_kvchunk_sizing_pins():
    """Pin the measured-optimal streaming-path sizing (kvchunk_sweep_r5c.log:
    blk_q=2048/chunk=1024 = 89.5 TF/s at the V=4 shape; 1024/1024 = 86.4).
    A silent change here is a perf regression the e2e cells would hide."""
    from leftrefill_tpu.ops import flash_attention as fa

    assert fa._kv_chunk_for(8192) is None  # 1-ref ds1: resident (96.8 TF/s)
    # V=2 multiview (nk=16384) STREAMS: the blk64 resident plan is 64K over
    # the scoped-vmem limit on paper and fails AOT standalone
    # (kvchunk16k_ab_r5c.log; streaming measures 79.6 TF/s there)
    assert fa._kv_chunk_for(16384) == 1024
    assert fa._kv_chunk_for(32768) == 1024  # V=4 multiview: streaming
    assert fa._pick_block_kvchunk(32768) == 2048
    # fp32 halves both streaming blocks (bf16-sized plans measured over
    # scoped vmem at f32: mv_v2_quality_stream_r5c.log first attempt)
    assert fa._pick_block_kvchunk(32768, jnp.float32) == 1024
    assert fa._pick_block_bwd_chunk(32768) == 512
    assert fa._pick_block_bwd_chunk(32768, jnp.float32) == 256
    # non-power-of-two nq (V=3: 24576 = 2048*12) still gets the full block
    assert fa._kv_chunk_for(24576) == 1024
    assert fa._pick_block_kvchunk(24576) == 2048
