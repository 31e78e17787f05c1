"""Experiment management: directories, scalar logging, config copy.

Parity target: /root/reference/lib/utils/utils.py:50-60 (create_logger) and
the TensorBoard scalar streams of section 5.5 of SURVEY.md. TensorBoard is
used when available (torch ships in the image); a JSONL scalar log is always
written so headless environments keep full observability.
"""

from __future__ import annotations

import json
import os
import shutil
import time


class ScalarWriter:
    """TensorBoard + JSONL dual writer."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a",
                           buffering=1)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value, step: int):
        value = float(value)
        self._jsonl.write(json.dumps(
            dict(tag=tag, value=value, step=int(step), t=time.time())) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class NullWriter:
    """Scalar-writer no-op for non-main processes on multi-host pods:
    every host computes identical epoch/val scalars (the metric inputs
    are allgathered), so only process 0 writes TB/JSONL files."""

    def add_scalar(self, tag: str, value, step: int):
        pass

    def close(self):
        pass


def create_logger(cfg, exp_root: str = "experiments"):
    """experiments/{exp_name}/{ckpt,log}/ + config copy (utils.py:50-60).

    Multi-host: non-main processes get a NullWriter and skip the config
    copy (the experiment dir may be a shared filesystem)."""
    from horopose_tpu.parallel.multihost import is_main_process
    save_folder = os.path.join(exp_root, cfg.exp_name)
    ckpt_folder = os.path.join(save_folder, "ckpt")
    log_folder = os.path.join(save_folder, "log")
    if not is_main_process():
        return save_folder, ckpt_folder, log_folder, NullWriter()
    os.makedirs(ckpt_folder, exist_ok=True)
    os.makedirs(log_folder, exist_ok=True)
    writer = ScalarWriter(log_folder)
    if cfg.config_path and os.path.exists(cfg.config_path):
        shutil.copy(cfg.config_path, os.path.join(save_folder, "config.yaml"))
    return save_folder, ckpt_folder, log_folder, writer


class AverageMeter:
    """Streaming mean (torchnet AverageValueMeter equivalent)."""

    def __init__(self):
        self.sum = 0.0
        self.n = 0

    def add(self, value, n: int = 1):
        self.sum += float(value) * n
        self.n += n

    @property
    def mean(self) -> float:
        return self.sum / self.n if self.n else 0.0


class DeviceLogAccumulator:
    """Meter bank that never blocks the training loop on the device.

    `float(logs[t])` after every train step is a blocking device->host sync
    per batch — the exact pathology the reference's loop has
    (/root/reference/scripts/train_full.py:68-78, .item() per loss per
    batch) and that a donated jitted step otherwise avoids. Instead, the
    per-step log dicts (device scalars) are QUEUED, and one jax.device_get
    for the whole window runs every `flush_every` pushes — matching the
    TB-write cadence, so the device pipeline stays busy between flushes.

    Meters are exposed as `.meters[tag]` (AverageMeter). Call `.flush()`
    before reading them at epoch end.
    """

    def __init__(self, flush_every: int = 100):
        self.flush_every = int(flush_every)
        self._pending = []
        self.meters = {}

    def push(self, logs: dict):
        self._pending.append(dict(logs))
        if len(self._pending) >= self.flush_every:
            self.flush()

    def flush(self):
        if not self._pending:
            return
        import jax
        for d in jax.device_get(self._pending):
            for k, v in d.items():
                if k not in self.meters:
                    self.meters[k] = AverageMeter()
                self.meters[k].add(float(v))
        self._pending = []

    def mean(self, tag: str) -> float:
        m = self.meters.get(tag)
        return m.mean if m else 0.0
