"""Latency-oriented batch/CFG parallelism for the sampling hot path.

The serving protocol's UNet call is a CFG-doubled batch (uncond first:
/root/reference/ldm/models/diffusion/ddim.py:317-343), and batch elements
are fully independent through the UNet.  On a multi-chip slice the natural
latency lever is therefore sharding that doubled batch over a ``('data',)``
mesh: T chips each run (2·B)/T samples per step.  The only cross-chip
traffic is the per-step reshard of the latent/eps around the guidance
combine — a [B, h, w, 4] tensor (~64 KB at the headline 512x1024 canvas),
negligible on ICI.  At the single-canvas protocol (B=1, CFG batch 2) a
2-chip axis runs the cond and uncond branches concurrently; a serving
batch of 8 canvases spreads 16 UNet samples over up to 16 chips.

Implemented as ``shard_map`` around ``apply_model`` so each device executes
the ordinary single-device code path — including the Pallas conv/attention
kernels, which see a plain local batch — with replicated params; XLA/GSPMD
inserts the boundary reshards inside the jitted sampling scan.  The
conditioning KV cache composes transparently: its leaves are batch-leading
and shard with the batch.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from leftrefill_tpu.parallel.mesh import DATA_AXIS


def batch_parallel_apply(
    model,
    params,
    mesh: Mesh,
    cross_kv=None,
    axis: str = DATA_AXIS,
):
    """Build ``apply_fn(x, t, cond)`` with the batch sharded over ``axis``.

    ``model`` is a :class:`~leftrefill_tpu.diffusion.core.LeftRefillModel`;
    ``cross_kv`` an optional conditioning KV cache built on the SAME
    (CFG-doubled) batch layout the sampler passes.  The batch the sampler
    calls with must be divisible by the axis size.
    """
    size = mesh.shape[axis]
    sharded = jax.shard_map(
        lambda p, x, t, c, kv: model.apply_model(p, x, t, c, cross_kv=kv),
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )

    def apply_fn(x: jax.Array, t: jax.Array, cond) -> jax.Array:
        if x.shape[0] % size != 0:
            raise ValueError(
                f"batch-parallel sampling needs the (CFG-doubled) UNet batch "
                f"({x.shape[0]}) divisible by the '{axis}' mesh axis ({size}); "
                f"use a canvas batch that is a multiple of {size} (CFG doubles it) "
                f"or a smaller axis"
            )
        return sharded(params, x, t, cond, cross_kv)

    return apply_fn
