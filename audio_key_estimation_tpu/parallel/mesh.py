"""Device mesh + sharding for data-parallel training over ICI.

The reference is strictly single-GPU (pl.Trainer(gpus=1), SURVEY.md §2d).
Here training is SPMD over a jax.sharding.Mesh: parameters/optimizer state
replicated, the batch sharded over the 'data' axis; XLA inserts the gradient
all-reduce (psum) over ICI automatically when the jitted step consumes
sharded inputs and produces replicated outputs. No TP/PP/EP is warranted at
this model scale (SURVEY.md §2d) — the mesh abstraction is in place to add
axes later.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Sequence[int] = (),
              axis_names: Sequence[str] = ("data",),
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if not mesh_shape:
        mesh_shape = (len(devices),)
    n = int(np.prod(mesh_shape))
    dev = np.asarray(devices[:n]).reshape(mesh_shape)
    return Mesh(dev, tuple(axis_names[:dev.ndim]))


def fit_data_mesh(batch_size: int, mesh_shape: Sequence[int] = (),
                  axis_names: Sequence[str] = ("data",)) -> Mesh:
    """A 'data' mesh no larger than what the batch divides evenly.

    With an explicit mesh_shape the caller takes responsibility; otherwise
    pick the largest device count d <= len(devices) with batch_size % d == 0
    (debug runs with batch 2 must not try to shard over 8 chips)."""
    if mesh_shape:
        return make_mesh(mesh_shape, axis_names)
    n = len(jax.devices())
    d = max(k for k in range(1, n + 1) if batch_size % k == 0)
    return make_mesh((d,), axis_names)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree across the mesh (params / optimizer state)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch, mesh: Mesh, *, batch_dim: int = 0):
    """Shard every array in the batch along the 'data' axis of `batch_dim`.

    With microbatch stacking (acc, bs, ...) pass batch_dim=1 so the
    accumulation axis stays on-device and only the sample axis splits.
    """
    def _shard(x):
        spec = [None] * x.ndim
        if x.ndim > batch_dim:
            spec[batch_dim] = "data"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))
    return jax.tree_util.tree_map(_shard, batch)
