"""Checkpointing with the best-per-dataset policy.

Parity targets:
  /root/reference/lib/utils/utils.py:224-267  save_checkpoint: one "best"
    file per evaluation dataset (dr + azure/kinect/realsense/orb), each
    guarded against epoch regression ("prevent better model got covered
    during cluster rebooting", utils.py:233-241)
  /root/reference/lib/utils/utils.py:192-221  resume_run

Format: a single msgpack file per checkpoint (flax.serialization) holding
{epoch, metric, params, batch_stats, opt_state, lr_scheduler_last_epoch}.
File names keep the reference's `curr_best_auc(add)_*_model.pk` template so
existing tooling finds them.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

REAL_DATASETS = ("azure", "kinect", "realsense", "orb")


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint_file(path: str, *, epoch: int, metric: float, state,
                         extra: Optional[Dict] = None):
    payload = dict(
        epoch=np.int64(epoch),
        metric=np.float64(metric),
        params=serialization.to_state_dict(_to_host(state.params)),
        batch_stats=serialization.to_state_dict(_to_host(state.batch_stats)),
        opt_state=serialization.to_state_dict(_to_host(state.opt_state)),
        step=np.asarray(state.step),
    )
    if extra:
        payload.update(extra)
    data = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint_file(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_state(state, payload: Dict):
    """Shape-faithful restore of a TrainState from a checkpoint payload."""
    return state.replace(
        step=jax.tree.map(lambda t, s: np.asarray(s, t.dtype),
                          state.step, payload["step"]),
        params=serialization.from_state_dict(state.params, payload["params"]),
        batch_stats=serialization.from_state_dict(state.batch_stats,
                                                  payload["batch_stats"]),
        opt_state=serialization.from_state_dict(state.opt_state,
                                                payload["opt_state"]),
    )


def checkpoint_epoch(path: str) -> int:
    """Epoch recorded in an existing checkpoint, or -1."""
    if not os.path.exists(path):
        return -1
    try:
        return int(load_checkpoint_file(path)["epoch"])
    except Exception:
        return -1


class BestCheckpointKeeper:
    """Best-by-metric per dataset with the epoch-regression guard."""

    def __init__(self, ckpt_folder: str, robot_type: str,
                 template: str = "curr_best_auc(add)_DATASET_model.pk",
                 mode: str = "max"):
        self.folder = ckpt_folder
        self.robot_type = robot_type
        self.mode = mode
        os.makedirs(ckpt_folder, exist_ok=True)
        self.paths = {"dr": os.path.join(
            ckpt_folder, template.replace("_DATASET", ""))}
        for name in REAL_DATASETS:
            self.paths[name] = os.path.join(
                ckpt_folder, template.replace("DATASET", name))
        init = 0.0 if mode == "max" else float("inf")
        self.best = {k: init for k in self.paths}

    def resume(self) -> Dict[str, float]:
        for name, path in self.paths.items():
            if os.path.exists(path):
                try:
                    self.best[name] = float(
                        load_checkpoint_file(path)["metric"])
                except Exception:
                    pass
        return dict(self.best)

    def maybe_save(self, metrics: Dict[str, float], state, epoch: int,
                   lr_last_epoch: int = -1):
        """metrics: {dataset_name: auc}. Saves every dataset whose metric
        improved AND whose on-disk checkpoint is from an older epoch."""
        saved = []
        names = ["dr"] + (list(REAL_DATASETS)
                          if self.robot_type == "panda" else [])
        for name in names:
            if name not in metrics:
                continue
            if epoch <= checkpoint_epoch(self.paths[name]):
                continue  # guard: never overwrite a newer checkpoint
            improved = metrics[name] > self.best[name] if self.mode == "max" \
                else metrics[name] < self.best[name]
            if improved:
                self.best[name] = metrics[name]
                # multi-host: every process tracks bests (identical,
                # metrics are allgathered) but only process 0 writes files
                from horopose_tpu.parallel.multihost import is_main_process
                if is_main_process():
                    save_checkpoint_file(
                        self.paths[name], epoch=epoch, metric=metrics[name],
                        state=state,
                        extra=dict(lr_scheduler_last_epoch=np.int64(
                            lr_last_epoch)))
                saved.append(name)
        return saved
