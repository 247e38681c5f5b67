"""Device mesh + sharding helpers.

The reference's only parallelism is PyTorch-Lightning DDP data parallel
(train_inpainting.py:136, SURVEY §2.9).  TPU-native equivalent: a 1-axis
``Mesh(('data',))`` with the batch sharded over ICI/DCN and parameters
replicated; XLA inserts the gradient psum.  The mesh helper generalizes to
extra axes (e.g. ('data','model')) for future tensor-parallel use.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = (DATA_AXIS,)
) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if len(axis_names) == 1:
        shape = (n,)
    else:
        # put everything on the first axis by default
        shape = (n,) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host-side batch pytree with the batch axis sharded over 'data'."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)
