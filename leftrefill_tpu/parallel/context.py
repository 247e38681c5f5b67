"""Context-parallel multi-view attention: shard reference views across the
mesh, all-gather K/V for the joint self-attention.

The reference has no sequence/context parallelism (SURVEY §2.9); its
multi-view rearranged self-attention grows the sequence to V*HW <= 16384
tokens on ONE device (multiview_attention.py:448).  On TPU the views can
instead live on different chips: each device holds its view's tokens, the
joint attention all-gathers K and V over the ICI ring (a bounded, tiny
collective — V*HW*C bf16 <= 20MB) while queries stay local.  This is the
BASELINE.json north-star "shard reference views across ICI" feature.

Exact equivalence: softmax(Q_local @ gather(K)^T) @ gather(V) computed
per-device equals the single-device joint attention rows for that device's
view.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

VIEW_AXIS = "view"


def make_view_mesh(n_view_devices: int) -> Mesh:
    import numpy as np

    devices = np.asarray(jax.devices()[:n_view_devices]).reshape(n_view_devices)
    return Mesh(devices, (VIEW_AXIS,))


def context_parallel_joint_attention(
    mesh: Mesh,
    q: jax.Array,  # [V*HW_local? no: [B, V, HW, H*D] host-side, views on axis 1
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
):
    """Joint self-attention over all views with views sharded on the mesh.

    q/k/v: [B, V, HW, inner].  Sharding: axis 1 over VIEW_AXIS.  Each device
    computes its view's queries against the all-gathered K/V of every view.
    Returns [B, V, HW, inner] with the same sharding.
    """
    from leftrefill_tpu.ops.attention import multi_head_attention

    def local_fn(q_l, k_l, v_l):
        # q_l: [B, V/n, HW, inner] local shard
        k_all = jax.lax.all_gather(k_l, VIEW_AXIS, axis=1, tiled=True)  # [B, V, HW, inner]
        v_all = jax.lax.all_gather(v_l, VIEW_AXIS, axis=1, tiled=True)
        b, v_loc, hw, inner = q_l.shape
        v_tot = k_all.shape[1]
        q_flat = q_l.reshape(b, v_loc * hw, inner)
        k_flat = k_all.reshape(b, v_tot * hw, inner)
        v_flat = v_all.reshape(b, v_tot * hw, inner)
        out = multi_head_attention(q_flat, k_flat, v_flat, num_heads)
        return out.reshape(b, v_loc, hw, inner)

    shard = NamedSharding(mesh, P(None, VIEW_AXIS))
    fn = jax.jit(
        jax.shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(None, VIEW_AXIS), P(None, VIEW_AXIS), P(None, VIEW_AXIS)),
            out_specs=P(None, VIEW_AXIS),
        )
    )
    q, k, v = (jax.device_put(x, shard) for x in (q, k, v))
    return fn(q, k, v)
