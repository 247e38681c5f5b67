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
view (softmax rows are complete because the full key set is gathered).

Two entry points:
- ``make_context_parallel_attn(mesh, view_num)`` — drop-in replacement for
  ops.attention.multi_head_attention, injected into the multi-view
  transformer block's self-attention (models/multiview.py) via
  ``CrossAttention.attn_fn``.  Composes with data parallelism: the mesh may
  carry a 'data' axis for the scene batch alongside the 'view' axis.
- ``context_parallel_joint_attention(mesh, q, k, v, heads)`` — standalone
  4-D [B, V, HW, inner] form used by tests and ad-hoc sharding experiments.

Inside the shard_map the local shard still goes through
ops.attention.multi_head_attention, so the Pallas flash kernel handles the
gathered-KV attention on TPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

VIEW_AXIS = "view"
DATA_AXIS = "data"


def make_view_mesh(n_view_devices: int, n_data: int = 1) -> Mesh:
    """Mesh with a 'view' axis (and a leading 'data' axis when n_data > 1)."""
    import numpy as np

    n = n_data * n_view_devices
    devices = np.asarray(jax.devices()[:n])
    if n_data > 1:
        return Mesh(devices.reshape(n_data, n_view_devices), (DATA_AXIS, VIEW_AXIS))
    return Mesh(devices.reshape(n_view_devices), (VIEW_AXIS,))


def _joint_attention_local(q_l, k_l, v_l, num_heads: int, view_axis: str):
    """Per-shard body: q stays local, K/V all-gathered over the view axis.

    q_l/k_l/v_l: [B_local, V_local, HW, inner]."""
    from leftrefill_tpu.ops.attention import multi_head_attention

    k_all = jax.lax.all_gather(k_l, view_axis, axis=1, tiled=True)  # [B_l, V, HW, inner]
    v_all = jax.lax.all_gather(v_l, view_axis, axis=1, tiled=True)
    b, v_loc, hw, inner = q_l.shape
    v_tot = k_all.shape[1]
    q_flat = q_l.reshape(b, v_loc * hw, inner)
    k_flat = k_all.reshape(b, v_tot * hw, inner)
    v_flat = v_all.reshape(b, v_tot * hw, inner)
    out = multi_head_attention(q_flat, k_flat, v_flat, num_heads)
    return out.reshape(b, v_loc, hw, inner)


def _specs(mesh: Mesh) -> P:
    dp = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
    return P(dp, VIEW_AXIS)


def make_context_parallel_attn(mesh: Mesh, view_num: int):
    """Build an attention function with the multi_head_attention signature
    (q/k/v: [B, V*HW, inner]) that shards the V views of the joint sequence
    over the mesh's 'view' axis.  Injected into the multi-view self-attention
    (MultiViewBasicTransformerBlock); usable under jit — shard_map reshards
    its operands as needed."""
    def attn(q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int) -> jax.Array:
        from leftrefill_tpu.ops.attention import multi_head_attention

        b, seq, inner = q.shape
        hw = seq // view_num
        if view_num % mesh.shape[VIEW_AXIS] != 0:
            return multi_head_attention(q, k, v, num_heads)
        # shard the scene batch over 'data' only when it divides (module init
        # and tiny log batches trace with b == 1)
        dp = (
            DATA_AXIS
            if DATA_AXIS in mesh.axis_names and b % mesh.shape[DATA_AXIS] == 0
            else None
        )
        spec = P(dp, VIEW_AXIS)

        def run(q4, k4, v4):
            return _joint_attention_local(q4, k4, v4, num_heads, VIEW_AXIS)

        fn = jax.shard_map(
            run,
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
        )
        q4, k4, v4 = (x.reshape(b, view_num, hw, inner) for x in (q, k, v))
        out = fn(q4, k4, v4)
        return out.reshape(b, seq, inner)

    return attn


def context_parallel_joint_attention(
    mesh: Mesh,
    q: jax.Array,  # [B, V, HW, inner]
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
):
    """Standalone 4-D form: joint self-attention over all views with the view
    axis sharded on the mesh.  Returns [B, V, HW, inner], same sharding."""
    spec = _specs(mesh)
    shard = NamedSharding(mesh, spec)
    fn = jax.jit(
        jax.shard_map(
            lambda a, b_, c: _joint_attention_local(a, b_, c, num_heads, VIEW_AXIS),
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
        )
    )
    q, k, v = (jax.device_put(x, shard) for x in (q, k, v))
    return fn(q, k, v)
