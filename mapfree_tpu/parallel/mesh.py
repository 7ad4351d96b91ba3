"""Device mesh + sharding helpers.

The reference trains on a single GPU (reference: train.py:53 ``devices=1``)
with no distributed backend (SURVEY.md §2.8). The TPU-native design instead
runs every step as one jit-compiled SPMD program over a
``jax.sharding.Mesh``:

- batches are sharded over the ``data`` axis (ICI all-reduce for gradients,
  inserted by the compiler),
- parameters/optimizer state are replicated,
- the inference sweep shards query pairs the same way.

No hand-written collectives are needed for capability parity; the mesh/axis
plumbing below is the single place sharding policy lives, so model/expert
axes can be added later without touching call sites.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(cfg=None, devices=None) -> Mesh:
    """Build the device mesh. Default: 1-D data mesh over all devices."""
    if devices is None:
        devices = jax.devices()
    if cfg is not None and cfg.TPU.MESH_SHAPE:
        shape = tuple(cfg.TPU.MESH_SHAPE)
        axes = tuple(cfg.TPU.MESH_AXES)[: len(shape)]
        n = int(np.prod(shape))
        return Mesh(np.asarray(devices[:n]).reshape(shape), axes)
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis for a batch pytree leaf."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the mesh, sharding the leading axis."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
