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
