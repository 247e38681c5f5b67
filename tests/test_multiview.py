"""Multi-view rearranged self-attention tests
(reference: multiview_attention.py:394-468, configs/multiview_ref_inpainting.yaml)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leftrefill_tpu.models.multiview import (
    MultiViewBasicTransformerBlock,
    MultiViewUnetModel,
)
from leftrefill_tpu.models.unet import BasicTransformerBlock, UNetModel

DIM, HEADS, DHEAD, CTX = 16, 2, 8, 12


def _init_block(cls, **kw):
    m = cls(dim=DIM, n_heads=HEADS, d_head=DHEAD, context_dim=CTX, **kw)
    x = jnp.zeros((2, 8, DIM))
    ctx = jnp.zeros((2, 7, CTX))
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x, ctx)
    return m, params


def test_joint_selfattn_mixes_views():
    """With view_num=2, view 0's output must depend on view 1's content;
    a plain block must NOT mix across batch rows."""
    mv, params = _init_block(MultiViewBasicTransformerBlock, view_num=2)
    plain = BasicTransformerBlock(dim=DIM, n_heads=HEADS, d_head=DHEAD, context_dim=CTX)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, DIM).astype(np.float32))  # rows = 2 views of 1 scene
    # non-uniform perturbation of view 1 only (a constant shift would be
    # nulled by the pre-attention LayerNorm)
    x2 = x.at[1].add(jnp.asarray(rng.randn(8, DIM).astype(np.float32)))
    ctx = jnp.asarray(rng.randn(2, 7, CTX).astype(np.float32))

    f_mv = jax.jit(lambda x: mv.apply(params, x, ctx))
    f_plain = jax.jit(lambda x: plain.apply(params, x, ctx))
    dv0_mv = np.abs(np.asarray(f_mv(x2))[0] - np.asarray(f_mv(x))[0]).max()
    dv0_plain = np.abs(np.asarray(f_plain(x2))[0] - np.asarray(f_plain(x))[0]).max()
    assert dv0_mv > 1e-6, "multi-view block did not mix across views"
    assert dv0_plain < 1e-7, "plain block must not mix across batch rows"


def test_concat_target_shares_target_half():
    """concat_target: canvases [view|target] share the target; after the block
    the right halves must be identical across the scene's canvases
    (the scatter at multiview_attention.py:456-460)."""
    view_num = 3  # 2 canvases per scene
    mv, params = _init_block(
        MultiViewBasicTransformerBlock, view_num=view_num, concat_target=True
    )
    s = 4
    hw = s * 2 * s
    rng = np.random.RandomState(1)
    target = rng.randn(1, s, s, DIM).astype(np.float32)
    canvases = []
    for p in range(view_num - 1):
        left = rng.randn(1, s, s, DIM).astype(np.float32)
        canvases.append(np.concatenate([left, target], axis=2))
    x = jnp.asarray(np.concatenate(canvases, axis=0).reshape(view_num - 1, hw, DIM))
    ctx = jnp.broadcast_to(
        jnp.asarray(rng.randn(1, 7, CTX).astype(np.float32)), (view_num - 1, 7, CTX)
    )
    out = np.asarray(jax.jit(lambda x: mv.apply(params, x, ctx))(x))
    out = out.reshape(view_num - 1, s, 2 * s, DIM)
    rights = out[:, :, s:, :]
    assert np.allclose(rights[0], rights[1], atol=1e-5)
    lefts = out[:, :, :s, :]
    assert not np.allclose(lefts[0], lefts[1])


def test_multiview_unet_params_match_base_unet():
    """MultiViewUnetModel must have the exact UNet parameter structure so SD2
    weights load unchanged (multiview_unet.py is a UNetModel clone)."""
    kw = dict(
        in_channels=9, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_head_channels=8,
        context_dim=16,
    )
    mv = MultiViewUnetModel(view_num=2, **kw)
    base = UNetModel(**kw)
    x = jnp.zeros((2, 8, 16, 9))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 7, 16))
    s_mv = jax.eval_shape(mv.init, jax.random.PRNGKey(0), x, t, ctx)
    s_base = jax.eval_shape(base.init, jax.random.PRNGKey(0), x, t, ctx)
    assert jax.tree_util.tree_structure(s_mv) == jax.tree_util.tree_structure(s_base)
    # and it runs with the view-joint self-attention (batch = b*view_num)
    params = jax.jit(mv.init)(jax.random.PRNGKey(0), x, t, ctx)
    out = jax.jit(mv.apply)(params, x, t, ctx)
    assert out.shape == (2, 8, 16, 4)


MV_CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "multiview_ref_inpainting.yaml")


def test_multiview_yaml_builds():
    from leftrefill_tpu.config import build_model_from_config

    bundle = build_model_from_config(MV_CFG)
    # 20 repeated sp tokens + 2 views x 30 view tokens
    assert len(bundle.cond_bundle.special_tokens) == 20 + 60
    assert bundle.cond_bundle.special_tokens[20] == "<view_direct-0-0"
    assert bundle.model.unet.block_kwargs["view_num"] == 2
    assert bundle.cond_bundle.init_text is not None
    assert len(bundle.cond_bundle.init_text) == 80
