#!/usr/bin/env python
"""Input-pipeline throughput benchmark (host-side, no TPU).

At the flagship training rate (~400 img/s/chip bf16) the DREAM loader must
sustain the same rate of jpg decode + double crop + augmentation per chip
(SURVEY.md section 7 hard-part 6: the reference's PIL pipeline is the
bottleneck at scale). This bench measures images/sec through the real
DataLoader over a fabricated DREAM directory (640x480 jpgs, the real
format) across worker counts, thread vs process pools, and the native C++
fused crop on/off.

Usage: python bench_loader.py [--images 64] [--batch 32] [--seconds 8]
Prints one JSON line per configuration plus a summary line.
"""

import argparse
import json
import os
import sys
import tempfile
import time

# host-side bench: never touch the (slow, single-tile) remote-TPU tunnel,
# and keep forked/spawned data workers off it too (they SIGABRT if the
# parent holds the tunnel — see CLAUDE.md)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
try:  # the env var alone is too late if jax was already initialized
    import jax
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))


class PrecomputedDataset:
    """Serves ready-made samples (no decode, no augs, no crops): isolates
    the sampler -> worker pool -> collate -> prefetch-queue path itself.
    If THIS path cannot sustain the training rate, no amount of decode
    parallelism helps — it is the VERDICT r2 'queue/collate bottleneck
    above the per-worker decode' probe."""

    def __init__(self, ds, n):
        self.samples = [ds[i % len(ds)] for i in range(n)]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def sample_nbytes(sample):
    import numpy as np
    total = 0

    def rec(v):
        nonlocal total
        if isinstance(v, dict):
            for x in v.values():
                rec(x)
        elif isinstance(v, np.ndarray):
            total += v.nbytes
    rec(sample)
    return total


def measure(ds, batch_size, num_workers, use_processes, seconds):
    from horopose_tpu.data import DataLoader
    loader = DataLoader(ds, batch_size=batch_size, num_workers=num_workers,
                        drop_last=True, use_processes=use_processes)
    # warmup one epoch pass to populate caches / spawn pools
    for _ in loader:
        break
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        for batch in loader:
            n += batch["TCO"].shape[0]
            if time.perf_counter() - t0 >= seconds:
                break
    dt = time.perf_counter() - t0
    loader.close()
    return n / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=64)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seconds", type=float, default=8.0)
    p.add_argument("--workers", type=int, nargs="+", default=None)
    p.add_argument("--overhead", action="store_true",
                   help="serve precomputed samples: measures ONLY the "
                        "sampler/pool/collate/prefetch overhead")
    args = p.parse_args()

    n_cpus = os.cpu_count() or 1
    workers = args.workers or sorted({1, 2, min(4, n_cpus), n_cpus})

    from fixtures import make_synthetic_dream_dataset
    from horopose_tpu.data import DreamDataset

    tmp = tempfile.mkdtemp(prefix="bench_loader_")
    train_dir = make_synthetic_dream_dataset(
        os.path.join(tmp, "dream"), "panda", n_images=args.images,
        split="train_dr", seed=0)

    if args.overhead:
        base = DreamDataset(train_dir, color_jitter=False,
                            rgb_augmentation=False,
                            occlusion_augmentation=False,
                            rootnet_resize_hw=(256, 256),
                            other_resize_hw=(256, 256))
        ds = PrecomputedDataset(base, max(args.images, 64))
        nbytes = sample_nbytes(ds[0])
        results = []
        for use_processes in (False, True):
            for nw in workers:
                try:
                    ips = measure(ds, args.batch, nw, use_processes,
                                  args.seconds)
                except Exception as e:
                    print(f"# FAILED workers={nw} proc={use_processes}: {e}",
                          file=sys.stderr)
                    continue
                rec = dict(metric="loader_overhead_throughput",
                           value=round(ips, 1), unit="images/sec",
                           workers=nw,
                           pool="process" if use_processes else "thread",
                           mb_per_s=round(ips * nbytes / 1e6, 1),
                           sample_kb=round(nbytes / 1e3, 1), n_cpus=n_cpus)
                results.append(rec)
                print(json.dumps(rec), flush=True)
        if results:
            best = max(results, key=lambda r: r["value"])
            print(json.dumps(dict(
                metric="loader_overhead_best", value=best["value"],
                unit="images/sec",
                config={k: best[k] for k in ("workers", "pool")},
                n_cpus=n_cpus,
                sustains_train_rate=best["value"] >= 400.0)))
        return

    results = []
    for decode_cache in (False, True):
        cache_dir = os.path.join(tmp, "decode_cache") if decode_cache else None
        for disable_native in (False, True):
            os.environ.pop("HOROPOSE_DISABLE_NATIVE", None)
            if disable_native:
                os.environ["HOROPOSE_DISABLE_NATIVE"] = "1"
            ds = DreamDataset(train_dir, color_jitter=True,
                              rgb_augmentation=True,
                              occlusion_augmentation=True,
                              rootnet_resize_hw=(256, 256),
                              other_resize_hw=(256, 256),
                              decode_cache_dir=cache_dir)
            if decode_cache:
                for i in range(len(ds)):  # pre-fill: measure the hit path
                    ds[i]
            for use_processes in (False, True):
                for nw in workers:
                    try:
                        ips = measure(ds, args.batch, nw, use_processes,
                                      args.seconds)
                    except Exception as e:
                        print(f"# FAILED workers={nw} proc={use_processes} "
                              f"native={not disable_native}: {e}",
                              file=sys.stderr)
                        continue
                    rec = dict(metric="loader_throughput",
                               value=round(ips, 1),
                               unit="images/sec", workers=nw,
                               pool="process" if use_processes else "thread",
                               native_crop=not disable_native,
                               decode_cache=decode_cache, n_cpus=n_cpus)
                    results.append(rec)
                    print(json.dumps(rec), flush=True)
    os.environ.pop("HOROPOSE_DISABLE_NATIVE", None)
    if results:
        best = max(results, key=lambda r: r["value"])
        print(json.dumps(dict(metric="loader_throughput_best",
                              value=best["value"], unit="images/sec",
                              config={k: best[k] for k in
                                      ("workers", "pool", "native_crop",
                                       "decode_cache")},
                              n_cpus=n_cpus,
                              sustains_train_rate=best["value"] >= 400.0)))


if __name__ == "__main__":
    main()
