"""Decoded-jpg memmap cache (horopose_tpu/data/cache.py).

The cache must be exact (hit == decode), survive worker processes, bypass
odd-sized images per item, and actually skip the decode on hit (proved by
deleting the jpgs after the fill pass).
"""

import os
import shutil
from pathlib import Path

import numpy as np
import pytest

from fixtures import make_synthetic_dream_dataset
from horopose_tpu.data import DataLoader, DreamDataset
from horopose_tpu.data.cache import DecodedImageCache

KW = dict(color_jitter=False, rgb_augmentation=False,
          occlusion_augmentation=False, rootnet_resize_hw=(64, 64),
          other_resize_hw=(64, 64))


@pytest.fixture(scope="module")
def ds_dir(tmp_path_factory):
    return make_synthetic_dream_dataset(
        tmp_path_factory.mktemp("dc") / "dream", "panda", n_images=5,
        split="train_dr", seed=3)


def _tree_equal(a, b):
    assert a.keys() == b.keys()
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k])
        else:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_cache_hit_equals_decode(ds_dir, tmp_path):
    plain = DreamDataset(ds_dir, **KW)
    cached = DreamDataset(ds_dir, decode_cache_dir=tmp_path / "c", **KW)
    for i in range(len(plain)):
        _tree_equal(plain[i], cached[i])          # fill pass
    assert cached.decode_cache.complete
    for i in range(len(plain)):
        _tree_equal(plain[i], cached[i])          # hit pass


def test_cache_hit_skips_decode(ds_dir, tmp_path, monkeypatch):
    """After the fill pass, hits never touch PIL (decode is skipped)."""
    work = tmp_path / "panda_synth_train_dr"
    shutil.copytree(ds_dir, work)
    cache = tmp_path / "cache"
    ds = DreamDataset(work, decode_cache_dir=cache, **KW)
    ref = [ds[i] for i in range(len(ds))]
    assert ds.decode_cache.complete

    def boom(*a, **k):
        raise AssertionError("PIL decode reached on a cache hit")

    import horopose_tpu.data.dream as dream_mod
    monkeypatch.setattr(dream_mod.Image, "open", boom)
    ds2 = DreamDataset(work, decode_cache_dir=cache, **KW)
    for i in range(len(ds2)):
        _tree_equal(ref[i], ds2[i])


def test_changed_jpgs_invalidate_cache(ds_dir, tmp_path):
    """Regenerated/replaced jpgs must NOT be served stale from the cache:
    the dataset fingerprint (path + first/last jpg size+mtime) rejects the
    old fill and the cache rebuilds from the new images."""
    from PIL import Image
    work = tmp_path / "panda_synth_train_dr"
    shutil.copytree(ds_dir, work)
    cache = tmp_path / "cache"
    ds = DreamDataset(work, decode_cache_dir=cache, **KW)
    old0 = ds[0]["root"]["images"].copy()
    for i in range(len(ds)):
        ds[i]
    assert ds.decode_cache.complete

    jpgs = sorted(Path(work).glob("*.jpg"))
    for jpg in jpgs:  # "regenerate" the dataset: different pixel content
        arr = np.asarray(Image.open(jpg).convert("RGB"))
        Image.fromarray(255 - arr).save(jpg, quality=95)
    os.utime(jpgs[0], (1e9, 1e9))  # force a distinct mtime even on fast fs

    ds2 = DreamDataset(work, decode_cache_dir=cache, **KW)
    assert ds2.decode_cache.hit_count() == 0  # old fill dropped
    new0 = ds2[0]["root"]["images"]
    assert not np.array_equal(old0, new0)  # serves NEW pixels, not stale


def test_same_cache_dir_different_dataset_rejected(ds_dir, tmp_path):
    """Two same-sized datasets pointed at ONE cache dir (e.g. colliding
    basenames under HOROPOSE_CACHE_DIR) must not serve each other's images."""
    other = make_synthetic_dream_dataset(
        tmp_path / "dream2", "panda", n_images=5, split="train_dr", seed=99)
    cache = tmp_path / "cache"
    ds_a = DreamDataset(ds_dir, decode_cache_dir=cache, **KW)
    a0 = ds_a[0]["root"]["images"].copy()
    for i in range(len(ds_a)):
        ds_a[i]
    assert ds_a.decode_cache.complete
    ds_b = DreamDataset(other, decode_cache_dir=cache, **KW)
    assert ds_b.decode_cache.hit_count() == 0  # A's fill rejected for B
    assert not np.array_equal(a0, ds_b[0]["root"]["images"])


def test_stale_init_lock_is_recovered(ds_dir, tmp_path):
    """A crashed creator's leftover .init_lock (e.g. Ctrl-C between lock
    and meta.json) must not wedge the cache dir forever: an old lock is
    stolen and creation retried; the cache then fills normally."""
    cache = tmp_path / "c"
    cache.mkdir()
    lock = cache / ".init_lock"
    lock.touch()
    os.utime(lock, (1, 1))  # ancient -> stale
    ds = DreamDataset(ds_dir, decode_cache_dir=cache, **KW)
    ds[0]
    assert ds.decode_cache.hit_count() == 1
    assert not lock.exists()  # the winner removed its own lock too


def test_live_lock_poisons_instead_of_spinning(ds_dir, tmp_path, monkeypatch):
    """A fresh lock with no meta (a live creator... that never finishes)
    must poison the instance after ONE bounded wait — not re-enter the wait
    loop on every __getitem__."""
    import horopose_tpu.data.cache as cache_mod
    monkeypatch.setattr(cache_mod, "_WAIT_S", 0.05)
    cache = tmp_path / "c"
    cache.mkdir()
    (cache / ".init_lock").touch()  # fresh: not stale, never completes
    ds = DreamDataset(ds_dir, decode_cache_dir=cache, **KW)
    import time as _t
    ds[0]                      # pays the one bounded wait, then poisons
    assert ds.decode_cache.n == -1
    t0 = _t.perf_counter()
    for i in range(len(ds)):   # subsequent items must not wait at all
        ds[i]
    assert _t.perf_counter() - t0 < 2.0
    assert ds.decode_cache.hit_count() == 0


def test_odd_sized_image_bypasses_cache(ds_dir, tmp_path):
    from PIL import Image
    work = tmp_path / "panda_synth_train_dr"
    shutil.copytree(ds_dir, work)
    jpgs = sorted(Path(work).glob("*.jpg"))
    # shrink one image: its slot shape mismatches the first-opened image
    small = np.asarray(Image.open(jpgs[2]).convert("RGB"))[:240, :320]
    Image.fromarray(small).save(jpgs[2], quality=95)

    ds = DreamDataset(work, decode_cache_dir=tmp_path / "c", **KW)
    a = [ds[i] for i in range(len(ds))]
    assert not ds.decode_cache.complete            # the odd item never fills
    assert ds.decode_cache.hit_count() == len(ds) - 1
    b = [ds[i] for i in range(len(ds))]            # odd item re-decodes
    for x, y in zip(a, b):
        _tree_equal(x, y)


def test_cache_with_process_workers(ds_dir, tmp_path):
    ds = DreamDataset(ds_dir, decode_cache_dir=tmp_path / "c", **KW)
    loader = DataLoader(ds, batch_size=2, num_workers=2, drop_last=False,
                        use_processes=True)
    n = 0
    for batch in loader:
        n += batch["TCO"].shape[0]
    loader.close()
    assert n == len(ds)
    # the parent-side cache object observes the workers' fills (memmap)
    assert DecodedImageCache(tmp_path / "c", len(ds)).complete


def test_readonly_dataset_dir_disables_cache_gracefully(ds_dir, tmp_path):
    target = tmp_path / "nope"
    target.mkdir()
    os.chmod(target, 0o555)
    try:
        ds = DreamDataset(ds_dir, decode_cache_dir=target / "c", **KW)
        sample = ds[0]                              # must still work
        assert sample["root"]["images"].shape == (64, 64, 3)
    finally:
        os.chmod(target, 0o755)


def test_warm_cache_cli(ds_dir, tmp_path):
    from horopose_tpu.tools.warm_cache import main, warm
    cache_dir = str(tmp_path / "warm")
    n = warm(str(ds_dir), cache_dir=cache_dir, workers=2)
    assert n == 5
    assert DecodedImageCache(cache_dir, 5).complete
    # idempotent second pass via the CLI entry point
    assert main([str(ds_dir), "--cache_dir", cache_dir]) == 0
    # warmed cache serves the dataset
    ds = DreamDataset(ds_dir, decode_cache_dir=cache_dir, **KW)
    plain = DreamDataset(ds_dir, **KW)
    _tree_equal(plain[0], ds[0])
