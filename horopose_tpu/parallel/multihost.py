"""Multi-host (multi-process) data parallelism for TPU pods.

The reference's distributed story ends at single-process DataParallel
(/root/reference/lib/core/function.py:100-102 wraps the model in
torch.nn.DataParallel — one python process, one host). On TPU pods JAX
runs ONE PROCESS PER HOST: each process addresses only its local chips
while jitted computations operate on global arrays spanning every host.
This module is everything the trainers need to scale across hosts with
the SAME jitted step they run on one chip:

  maybe_initialize()      jax.distributed.initialize() from env knobs
  process_count/index     thin jax wrappers (1/0 when single-process)
  is_main_process()       gate for writers / checkpoint files
  local_batch_size(B)     this process's share of the global batch
  DistributedSampler      rank-strided view of any epoch sampler
  to_host(tree)           device_get that also handles cross-host shards

Design: every process draws `local_batch_size(cfg.batch_size)` samples
through a `DistributedSampler`, `parallel.shard_batch` assembles the
global (B, ...) arrays via jax.make_array_from_process_local_data, and
the jitted train step is byte-identical to the single-host one — the
global-batch mean makes XLA insert the gradient psum over ICI/DCN exactly
as it does across a single-host mesh. Validated by a real 2-process
coordinator-service run on CPU devices (tests/test_multihost.py).
"""

from __future__ import annotations

import os

import jax
import numpy as np

__all__ = [
    "maybe_initialize", "process_count", "process_index", "is_main_process",
    "local_batch_size", "DistributedSampler", "to_host",
]


def maybe_initialize(verbose: bool = True) -> bool:
    """Initialize jax.distributed from env knobs; no-op without them.

    Must run before anything touches jax devices (scripts/train.py calls
    it first thing; evaluation — scripts/test.py — is single-host by
    design, like sim2real). Two activation modes:

      HOROPOSE_COORDINATOR=host:port HOROPOSE_NUM_PROCESSES=N
      HOROPOSE_PROCESS_ID=i     explicit coordinator (CPU clusters, tests)

      HOROPOSE_DISTRIBUTED=auto bare jax.distributed.initialize(), which
                                auto-detects the cluster on TPU pods
                                (TPU metadata / megascale env vars)

    Returns True when a multi-process runtime was initialized.
    """
    coord = os.environ.get("HOROPOSE_COORDINATOR")
    if coord:
        missing = [k for k in ("HOROPOSE_NUM_PROCESSES", "HOROPOSE_PROCESS_ID")
                   if k not in os.environ]
        if missing:
            verb = "is" if len(missing) == 1 else "are"
            raise ValueError(
                f"HOROPOSE_COORDINATOR is set but {' and '.join(missing)} "
                f"{verb} missing; all three are required for "
                "explicit-coordinator mode")
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["HOROPOSE_NUM_PROCESSES"]),
            process_id=int(os.environ["HOROPOSE_PROCESS_ID"]))
    elif os.environ.get("HOROPOSE_DISTRIBUTED", "").lower() in \
            ("auto", "1", "true"):
        jax.distributed.initialize()
    else:
        return False
    if verbose:
        print(f"[multihost] process {jax.process_index()}"
              f"/{jax.process_count()}: "
              f"{len(jax.local_devices())} local device(s), "
              f"{len(jax.devices())} global")
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_batch_size(global_batch_size: int) -> int:
    """This process's share of the global batch (the config's batch_size
    stays GLOBAL so configs mean the same thing at any scale)."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"batch_size {global_batch_size} must divide evenly over "
            f"{n} processes")
    return global_batch_size // n


class DistributedSampler:
    """Rank-strided view of a base sampler.

    Every process constructs the SAME base sampler (same seed, hence the
    same permutation) and takes indices [rank::count]. With pad=False
    (training) the len % count tail is dropped so every process yields
    exactly the same number of indices — a process with one extra batch
    would leave the others deadlocked in the step's collectives. With
    pad=True (eval) the tail wraps around to the start of the epoch
    instead — repeating the whole epoch as many times as needed when the
    set is smaller than one global batch of indices — so no sample is
    dropped and EVERY rank always yields exactly len(self) indices
    (torch DistributedSampler semantics); the duplicated samples bias
    eval means by at most count/len.
    """

    def __init__(self, base, rank: int = None, count: int = None,
                 pad: bool = False):
        self.base = base
        self.rank = jax.process_index() if rank is None else rank
        self.count = jax.process_count() if count is None else count
        if not 0 <= self.rank < self.count:
            raise ValueError(f"rank {self.rank} outside [0, {self.count})")
        self.pad = pad

    def __len__(self):
        n = len(self.base)
        return -(-n // self.count) if self.pad else n // self.count

    def __iter__(self):
        ids = list(iter(self.base))
        per_rank = len(self)
        total = per_rank * self.count
        if self.pad and 0 < len(ids) < total:
            # Repeat the whole epoch, not just a single wrap: with
            # len(ids) < total/2 (tiny eval set, many ranks) one wrap
            # leaves trailing ranks short (or empty), and their missing
            # batches would deadlock the validate loops' to_host
            # allgather collectives on a pod.
            ids = (ids * (-(-total // len(ids))))[:total]
        return iter(ids[self.rank:total:self.count])


def to_host(tree):
    """Numpy arrays from a pytree of host or device values, cross-host
    safe: addressable / fully-replicated arrays are fetched directly;
    batch-sharded global arrays are allgathered (tiled) so EVERY process
    sees the full global batch. The allgather is a collective — all
    processes must call to_host the same number of times in the same
    order (true for the validate loops: DistributedSampler equalizes the
    per-process batch counts)."""
    def one(x):
        if not isinstance(x, jax.Array):
            return np.asarray(x)
        if x.is_fully_addressable or x.is_fully_replicated:
            return np.asarray(jax.device_get(x))
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return jax.tree.map(one, tree)
