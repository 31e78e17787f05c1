"""Mesh construction and sharding helpers.

The reference's only multi-device strategy is single-process DataParallel
(SURVEY.md section 5.8; lib/core/function.py:100-102). The TPU-native
equivalent is batch sharding over a 1-D `data` mesh: params replicated,
batches split along axis 0, XLA inserting the gradient psum over ICI. The
mesh shape is a config knob (`cfg.mesh_shape`) so scale-out — single chip,
one slice, or multi-slice — never changes the train-step code.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D data mesh over the first n_devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a (nested dict) numpy batch with axis 0 sharded."""
    sharding = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
