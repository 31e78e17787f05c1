"""Samplers and a threaded prefetching loader.

Parity targets (reference, PyTorch):
  /root/reference/lib/dataset/samplers.py:7-31           PartialSampler/List
  /root/reference/lib/dataset/multiepoch_dataloader.py   persistent workers

TPU-native design: instead of torch DataLoader + fork workers, a simple
thread pool (PIL/numpy release the GIL for the heavy work) with double-
buffered batch prefetch; workers stay alive across epochs (the reference's
MultiEpochDataLoader exists solely to avoid worker respawn cost). Batches
are dicts of stacked numpy arrays ready for jnp.asarray.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


class PartialSampler:
    """Random subset of epoch_size indices per epoch (samplers.py:7-20)."""

    def __init__(self, ds, epoch_size: Optional[int], seed: int = 808):
        self.n_items = len(ds)
        self.epoch_size = min(epoch_size, self.n_items) if epoch_size \
            else self.n_items
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        return self.epoch_size

    def __iter__(self) -> Iterator[int]:
        return iter(self._rng.permutation(self.n_items)[:self.epoch_size]
                    .tolist())


class WeightedRandomSampler:
    """Sample indices with replacement proportionally to weights (the
    reference's resampling option, train_depthnet.py:62-64)."""

    def __init__(self, weights, num_samples: int, seed: int = 808):
        self.weights = np.asarray(weights, np.float64)
        self.weights = self.weights / self.weights.sum()
        self.num_samples = num_samples
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        return self.num_samples

    def __iter__(self):
        return iter(self._rng.choice(
            len(self.weights), size=self.num_samples, replace=True,
            p=self.weights).tolist())


class ListSampler:
    """Fixed index replay, for best/worst-case visualization passes
    (samplers.py:23-31)."""

    def __init__(self, ids: Sequence[int]):
        self.ids = list(ids)

    def __len__(self):
        return len(self.ids)

    def __iter__(self):
        return iter(self.ids)


def collate(samples: List[Dict]) -> Dict:
    """Stack a list of sample dicts (recursively) into batched arrays."""
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], dict):
            out[key] = collate(vals)
        else:
            out[key] = np.stack([np.asarray(v) for v in vals])
    return out


_WORKER_DS = None


def _proc_init(ds, counter, base_seed):
    """Per-worker state. CRITICAL: fork copies the parent's `random` /
    `np.random` Mersenne state into every worker, so without reseeding all
    workers draw IDENTICAL augmentation streams (same occlusion rects,
    same jitter factors, in the same order). Each worker takes a distinct
    id from the shared counter and reseeds — deterministic given
    base_seed, matching torch DataLoader's base_seed+worker_id scheme."""
    import random
    global _WORKER_DS
    _WORKER_DS = ds
    with counter.get_lock():
        wid = counter.value
        counter.value += 1
    random.seed(base_seed + wid)
    np.random.seed((base_seed + wid) % (2 ** 32))


def _proc_get(idx):
    return _WORKER_DS[idx]


def _worker_rng_probe(_):
    """Test hook: first random draws + pid of the executing worker. The
    tiny sleep spreads probe items over ALL pool workers."""
    import os
    import random
    import time
    time.sleep(0.05)
    return os.getpid(), random.random(), float(np.random.rand())


class DataLoader:
    """Prefetching loader with persistent workers.

    Default: a thread pool (PIL decode and the native crop kernel release
    the GIL). With use_processes=True a persistent fork-based process pool
    sidesteps the GIL entirely for the Python-bound share of the work —
    the right mode on multi-core TPU-VM hosts feeding >1k img/s.

    drop_last defaults True for training (static batch shapes keep XLA from
    recompiling); eval pads the final batch instead (see pad_batch).
    """

    def __init__(self, dataset, batch_size: int, sampler=None,
                 num_workers: int = 4, drop_last: bool = True,
                 prefetch: int = 4, use_processes: bool = False,
                 worker_seed: int = 808, start_method: str = "fork"):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.use_processes = use_processes
        self.worker_seed = worker_seed
        # "fork" (default): fast, inherits the decode cache memmaps, and
        # children do NOT re-run sitecustomize (important on hosts whose
        # sitecustomize registers an accelerator plugin in every fresh
        # python). "forkserver" avoids the fork-from-multithreaded-process
        # hazard instead; the dataset import chain is jax-free and the
        # decode cache pickles by path, so workers stay accelerator-free.
        self.start_method = start_method
        self._pool = None

    def _get_pool(self):
        if self._pool is None:
            import multiprocessing as mp
            import os
            ctx = mp.get_context(self.start_method)
            counter = ctx.Value("i", 0)
            # Non-fork children re-run sitecustomize; scrub the remote-TPU
            # plugin trigger so data workers never touch the accelerator
            # (same trap as __graft_entry__.dryrun_multichip).
            saved = None
            if self.start_method != "fork":
                saved = os.environ.pop("PALLAS_AXON_POOL_IPS", None)
            try:
                self._pool = ctx.Pool(self.num_workers,
                                      initializer=_proc_init,
                                      initargs=(self.dataset, counter,
                                                self.worker_seed))
            finally:
                if saved is not None:
                    os.environ["PALLAS_AXON_POOL_IPS"] = saved
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def __iter__(self):
        indices = list(iter(self.sampler)) if self.sampler is not None \
            else list(range(len(self.dataset)))
        batches = [indices[i:i + self.batch_size]
                   for i in range(0, len(indices), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        batch_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                if self.use_processes:
                    pool = self._get_pool()
                    for b in batches:
                        if stop.is_set():
                            return
                        samples = pool.map(_proc_get, b)
                        batch_q.put(collate(samples))
                else:
                    from concurrent.futures import ThreadPoolExecutor
                    with ThreadPoolExecutor(self.num_workers) as pool:
                        for b in batches:
                            if stop.is_set():
                                return
                            samples = list(pool.map(
                                self.dataset.__getitem__, b))
                            batch_q.put(collate(samples))
            except Exception as e:  # surface worker errors to the consumer
                batch_q.put(e)
            finally:
                batch_q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = batch_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def pad_batch(batch: Dict, target: int):
    """Pad a (possibly short) batch to `target` along axis 0 by repeating the
    last element; returns (padded_batch, n_valid)."""
    def pad(x):
        if isinstance(x, dict):
            return {k: pad(v) for k, v in x.items()}
        n = x.shape[0]
        if n == target:
            return x
        reps = np.repeat(x[-1:], target - n, axis=0)
        return np.concatenate([x, reps], axis=0)

    n_valid = next(iter(batch.values()))
    n_valid = n_valid.shape[0] if not isinstance(n_valid, dict) else \
        next(iter(n_valid.values())).shape[0]
    return pad(batch), n_valid
