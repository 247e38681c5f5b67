"""Context-parallel multi-view attention: sharded == single-device joint
attention (BASELINE north star: shard reference views across ICI)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leftrefill_tpu.parallel.context import (
    context_parallel_joint_attention,
    make_view_mesh,
)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_sharded_joint_attention_matches_single_device():
    B, V, HW, H, D = 2, 4, 64, 2, 8
    inner = H * D
    rng = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(s, (B, V, HW, inner), jnp.float32)
        for s in jax.random.split(rng, 3)
    )

    mesh = make_view_mesh(4)
    out = np.asarray(context_parallel_joint_attention(mesh, q, k, v, H))

    # single-device reference: fold views into the sequence
    from leftrefill_tpu.ops.attention import multi_head_attention

    q1 = q.reshape(B, V * HW, inner)
    k1 = k.reshape(B, V * HW, inner)
    v1 = v.reshape(B, V * HW, inner)
    ref = np.asarray(jax.jit(lambda q, k, v: multi_head_attention(q, k, v, H))(q1, k1, v1))
    ref = ref.reshape(B, V, HW, inner)
    assert np.abs(out - ref).max() < 1e-4


def _tiny_mv_unet(view_mesh=None):
    from leftrefill_tpu.models.multiview import MultiViewUnetModel

    return MultiViewUnetModel(
        view_num=2, view_mesh=view_mesh,
        in_channels=9, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(1, 2), channel_mult=(1, 2), num_head_channels=8,
        context_dim=32, dtype=jnp.float32,
    )


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 devices")
def test_context_parallel_block_matches_single_device():
    """Full MultiViewBasicTransformerBlock: the view-sharded self-attention
    must equal the single-device joint attention through the whole block
    (norms, cross-attn, FF included)."""
    from leftrefill_tpu.models.multiview import MultiViewBasicTransformerBlock

    mesh = make_view_mesh(2)
    kw = dict(dim=32, n_heads=2, d_head=16, context_dim=24, view_num=2)
    blk = MultiViewBasicTransformerBlock(**kw)
    blk_cp = MultiViewBasicTransformerBlock(**kw, view_mesh=mesh)

    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (4, 64, 32), jnp.float32)  # (b=2)*(v=2) rows
    ctx = jax.random.normal(jax.random.fold_in(rng, 1), (4, 7, 24), jnp.float32)
    params = blk.init(jax.random.PRNGKey(2), x, ctx)["params"]

    ref = np.asarray(jax.jit(blk.apply)({"params": params}, x, ctx))
    out = np.asarray(jax.jit(blk_cp.apply)({"params": params}, x, ctx))
    assert np.abs(out - ref).max() < 1e-4


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_context_parallel_full_unet_matches_single_device():
    """Full MultiViewUnetModel forward with views sharded over a
    ('data','view') mesh == the unsharded model (same params)."""
    from leftrefill_tpu.parallel.mesh import make_mesh

    mesh = make_view_mesh(2, n_data=2)
    m_ref = _tiny_mv_unet()
    m_cp = _tiny_mv_unet(view_mesh=mesh)

    rng = np.random.RandomState(0)
    x = rng.randn(4, 8, 16, 9).astype(np.float32)  # 2 scenes x 2 views
    t = np.array([5, 5, 9, 9], np.int64)
    ctx = rng.randn(4, 7, 32).astype(np.float32)

    params = jax.jit(m_ref.init)(
        jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx)
    )["params"]
    ref = np.asarray(jax.jit(m_ref.apply)({"params": params}, x, t, ctx))
    out = np.asarray(jax.jit(m_cp.apply)({"params": params}, x, t, ctx))
    assert np.abs(out - ref).max() < 1e-4
