"""Memory-mapped decoded-image cache for the DREAM loader.

At 2,000+ img/s/chip (bench.py) the Python-side jpg decode dominates the
input pipeline (SURVEY.md §7 hard-part 6: "the Python-side DREAM json
parsing and PIL augs become the bottleneck; needs a prebuilt index").
The reference has no equivalent — it re-decodes every jpg every epoch
(/root/reference/lib/dataset/dream.py:229, PIL Image.open per __getitem__).

This cache stores the decoded RGB uint8 array of every sample in a single
memory-mapped file, written lazily the first time each index is read, so
epoch 1 pays the usual decode cost and every later epoch reads at memmap
speed. Semantics are exact: the cached tensor is the PIL-decoded
`convert("RGB")` output, BEFORE any augmentation/truncation/crop — all the
per-epoch randomness downstream is untouched.

Layout under `cache_dir`:
  meta.json   {"n": N, "h": H, "w": W}   (slot shape = first decoded image)
  images.u8   memmap uint8 (N, H, W, 3)
  done.u8     memmap uint8 (N,)  1 = slot valid

Concurrency: thread and process workers share the files. Creation is
elected through an O_EXCL lock file (a second concurrent creator would
truncate the first one's slots); after that, writes are idempotent
(decoding image i always yields the same bytes), and the done flag for a
slot is written only after its payload, so a torn read can at worst miss
a concurrent fill and decode redundantly — never observe a half-written
slot as valid. Images whose shape differs from the slot shape bypass the
cache (per-item fallback, no error).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ["DecodedImageCache"]


class DecodedImageCache:
    def __init__(self, cache_dir, n_items: int):
        self.dir = Path(cache_dir)
        self.n = int(n_items)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._meta_path = self.dir / "meta.json"
        self._img_path = self.dir / "images.u8"
        self._done_path = self.dir / "done.u8"
        self._images: Optional[np.memmap] = None
        self._done: Optional[np.memmap] = None
        self._shape = None
        if self._meta_path.exists():
            self._open_existing()

    # -- internal ---------------------------------------------------------

    def _open_existing(self):
        try:
            meta = json.loads(self._meta_path.read_text())
            if int(meta["n"]) != self.n:
                return  # dataset changed size: leave cache disabled
            h, w = int(meta["h"]), int(meta["w"])
        except (KeyError, ValueError, json.JSONDecodeError):
            return
        self._shape = (h, w, 3)
        self._images = np.memmap(self._img_path, dtype=np.uint8, mode="r+",
                                 shape=(self.n, h, w, 3))
        self._done = np.memmap(self._done_path, dtype=np.uint8, mode="r+",
                               shape=(self.n,))

    def _create(self, h: int, w: int):
        # Exactly ONE creator: mode="w+" truncates, so a second concurrent
        # _create would wipe slots the first already filled. O_EXCL on a
        # lock file elects the creator atomically (works across processes);
        # losers wait for meta.json and open what the winner built.
        import time
        lock = self.dir / ".init_lock"
        try:
            os.close(os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
        except FileExistsError:
            for _ in range(1000):  # creator allocates within ~10 s
                if self._meta_path.exists():
                    break
                time.sleep(0.01)
            self._open_existing()
            return
        # Sized files first, meta last: a concurrent reader only opens the
        # cache once meta.json exists, by which point both memmaps are
        # fully allocated.
        np.memmap(self._img_path, dtype=np.uint8, mode="w+",
                  shape=(self.n, h, w, 3)).flush()
        np.memmap(self._done_path, dtype=np.uint8, mode="w+",
                  shape=(self.n,)).flush()
        tmp = self._meta_path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps({"n": self.n, "h": h, "w": w}))
        os.replace(tmp, self._meta_path)
        self._open_existing()

    # -- API --------------------------------------------------------------

    def get(self, idx: int) -> Optional[np.ndarray]:
        """Decoded RGB for idx, or None on miss. Returns a copy (the
        caller may mutate it in augmentations)."""
        if self._done is None and self._meta_path.exists():
            self._open_existing()  # another worker created it meanwhile
        if self._done is None or not self._done[idx]:
            return None
        return np.array(self._images[idx])

    def put(self, idx: int, rgb: np.ndarray) -> None:
        if self.n < 0:
            return  # poisoned: creation failed once, don't retry per item
        if self._done is None:
            if not self._meta_path.exists():
                try:
                    self._create(rgb.shape[0], rgb.shape[1])
                except OSError as e:  # read-only dataset dir, out of disk
                    print(f"[cache] disabled ({e})")
                    self.n = -1  # poison: every later put is a no-op
                    return
            else:
                self._open_existing()
            if self._done is None:
                return
        if rgb.shape != self._shape:
            return  # odd-sized image: per-item bypass
        self._images[idx] = rgb
        self._done[idx] = 1

    def __getstate__(self):
        # Pickle cheaply (paths only): np.memmap's default reduction
        # materializes the WHOLE array. Needed for forkserver/spawn data
        # workers; the memmaps reopen lazily in the child.
        return {"dir": self.dir, "n": self.n}

    def __setstate__(self, state):
        self.__init__(state["dir"], state["n"])

    @property
    def complete(self) -> bool:
        return self._done is not None and bool(self._done.all())

    def hit_count(self) -> int:
        return 0 if self._done is None else int(self._done.sum())
