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
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Mesh over the first n_devices (default: all).

    1-D by default. Pass `shape` (with matching `axis_names`) for an N-D
    mesh, e.g. make_mesh(axis_names=("data", "spatial"), shape=(2, 4)) —
    the layout used by latency-mode serving, where images are additionally
    split along H over the `spatial` axis (XLA inserts the conv halo
    exchanges; see image_sharding)."""
    devices = jax.devices()
    if shape is not None:
        total = int(np.prod(shape))
        if len(shape) != len(axis_names):
            raise ValueError(f"shape {shape} / axis_names {axis_names} "
                             "length mismatch")
        if total > len(devices):
            raise ValueError(f"mesh shape {shape} needs {total} devices, "
                             f"have {len(devices)}")
        return Mesh(np.asarray(devices[:total]).reshape(tuple(shape)),
                    axis_names=tuple(axis_names))
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=axis_names)


def train_mesh(cfg) -> Optional[Mesh]:
    """The trainers' mesh policy: cfg.mesh_shape when set; on multi-process
    runtimes default to ALL global devices (training without a mesh there
    would silently run per-process model replicas that diverge); None
    (plain single-device jit) otherwise."""
    if getattr(cfg, "mesh_shape", None):
        mesh = make_mesh(int(np.prod(cfg.mesh_shape)))
    elif jax.process_count() > 1:
        mesh = make_mesh()
    else:
        return None
    n = int(mesh.devices.size)
    if jax.process_count() > 1 and n != len(jax.devices()):
        # a partial mesh on a pod excludes some hosts' devices: excluded
        # ranks crash opaquely while included ranks silently train on a
        # fraction of the batch (each process still loads 1/N of it)
        raise ValueError(
            f"on a {jax.process_count()}-process run, mesh_shape "
            f"{cfg.mesh_shape} covers {n} of {len(jax.devices())} global "
            "devices; set mesh_shape to all devices (or omit it)")
    bs = int(getattr(cfg, "batch_size", 0) or 0)
    if bs and bs % n:
        raise ValueError(
            f"batch_size {bs} (global) must divide evenly over the "
            f"{n}-device data mesh; raise batch_size or shrink mesh_shape")
    return mesh


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 over the data axis (replicated if the mesh has none —
    e.g. a pure-'spatial' latency mesh)."""
    return NamedSharding(mesh, P("data" if "data" in mesh.axis_names
                                 else None))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) image batches: B over 'data' (if the mesh has it), H
    over 'spatial' (if the mesh has it). Sharding the convolution's H
    dimension makes XLA's SPMD partitioner split every conv spatially and
    insert halo exchanges over ICI — the latency lever for small batches,
    where data parallelism has nothing to split. Callers must keep
    H % mesh.shape['spatial'] == 0 (true for the 256/192/160/128 crop
    ladder on any power-of-two spatial axis)."""
    batch = "data" if "data" in mesh.axis_names else None
    spatial = "spatial" if "spatial" in mesh.axis_names else None
    return NamedSharding(mesh, P(batch, spatial))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a (nested dict) numpy batch with axis 0 sharded over 'data'.

    Contract: `batch` is THIS PROCESS'S shard — the full batch when
    single-process, `local_batch_size(cfg.batch_size)` rows per host on a
    multi-process pod (parallel/multihost.py). In the multi-process case
    the local rows are assembled into one global jax.Array via
    jax.make_array_from_process_local_data; the jitted step sees the same
    global (B, ...) it sees on one host."""
    sharding = data_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def prefetch_to_device(iterator, mesh: Optional[Mesh] = None, size: int = 2):
    """Stage loader batches onto device `size` steps ahead of consumption.

    Host->device transfers are asynchronous under PJRT: issuing the NEXT
    batches' transfers while the current step executes overlaps input
    staging with compute instead of serializing them at the jitted call
    boundary (the reference's loop pays exactly this serialization via
    per-batch `.cuda()` casts, /root/reference/lib/core/function.py:27-40).
    With a mesh the batch is placed batch-sharded over 'data'
    (shard_batch — on multi-process pods that is also the global-array
    assembly, so it is applied even at size=0); without one the leaves
    become default-device arrays (jnp.asarray). size=0/None disables the
    lookahead (the trainers' cfg.prefetch_batches=0 escape hatch): no-mesh
    batches pass through untouched, mesh batches are still sharded at
    consumption time. size extra batches live on device (~25 MB each at
    the flagship b64).
    """
    if not size and mesh is None:
        yield from iterator
        return
    from collections import deque

    if mesh is not None:
        stage = lambda b: shard_batch(b, mesh)  # noqa: E731
    else:
        # jnp.asarray, NOT device_put(x, device): a committed array keys a
        # DIFFERENT jit-cache entry than the uncommitted arrays the
        # un-prefetched path passes, and the resulting silent recompile of
        # a train step costs minutes (measured; see PERF_NOTES round 5).
        # The transfer is equally asynchronous either way.
        import jax.numpy as jnp
        stage = lambda b: jax.tree.map(jnp.asarray, b)  # noqa: E731
    if not size:
        for b in iterator:
            yield stage(b)
        return
    queue = deque()
    for b in iterator:
        queue.append(stage(b))
        if len(queue) > size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def shard_images(x, mesh: Mesh):
    """Device-put an image batch with B over 'data' and H over 'spatial'
    (whichever axes the mesh has; see image_sharding). Each axis falls
    back to replication independently when its dimension is not divisible
    by the mesh axis size (Predictor pads B before calling; raw callers
    with odd shapes still get a working placement)."""
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    batch, spatial = image_sharding(mesh).spec
    if batch and not (x.ndim >= 1 and x.shape[0] % axes["data"] == 0):
        batch = None
    if spatial and not (x.ndim >= 2 and x.shape[1] % axes["spatial"] == 0):
        spatial = None
    return jax.device_put(x, NamedSharding(mesh, P(batch, spatial)))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
