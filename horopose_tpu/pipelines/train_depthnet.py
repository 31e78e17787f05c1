"""Stage-1 DepthNet training pipeline.

Parity target: /root/reference/scripts/train_depthnet.py:19-421 — train the
RootNet depth estimator on the synthetic train set, validate on test_dr /
test_photo / the 4 real Panda sets, keep best-by-depth-error checkpoints per
dataset with the epoch-regression guard.

TPU-native: one jitted train step (normalize + forward + loss + update), a
jitted eval step, host-side meters only at epoch granularity.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from horopose_tpu import constants as C
from horopose_tpu.core.checkpoint import (BestCheckpointKeeper,
                                          load_checkpoint_file, restore_state)
from horopose_tpu.core.engine import (build_depthnet_eval_step,
                                      build_depthnet_train_step,
                                      create_train_state, make_optimizer)
from horopose_tpu.core.loggers import (AverageMeter, DeviceLogAccumulator,
                                       create_logger)
from horopose_tpu.data.samplers import pad_batch
from horopose_tpu.models.depth_net import RootNet
from horopose_tpu.parallel import (prefetch_to_device, shard_batch, to_host,
                                   train_mesh)
from horopose_tpu.pipelines.common import (apply_pretrained_backbone,
                                           get_dataloaders, set_seed)


def train_depthnet(cfg, max_epochs: int = None, max_steps_per_epoch: int = None):
    set_seed()
    save_folder, ckpt_folder, _, writer = create_logger(cfg)
    loaders = get_dataloaders(cfg)
    train_loader = loaders["train"]
    steps_per_epoch = max(len(train_loader), 1)

    model = RootNet(backbone_name=cfg.backbone_name,
                    pred_xy=bool(cfg.use_rootnet_xy_branch),
                    use_offset=bool(cfg.use_offset),
                    add_fc=bool(cfg.add_fc),
                    input_size=int(cfg.image_size))
    rng = jax.random.PRNGKey(C.GLOBAL_SEED)
    size = int(cfg.image_size)
    dummy_img = jnp.zeros((1, size, size, 3))
    dummy_k = jnp.ones((1,))
    from horopose_tpu.pipelines.common import jit_init
    variables = jit_init(model, rng, dummy_img, dummy_k)
    tx = make_optimizer(cfg, steps_per_epoch)
    state = create_train_state(variables, tx)
    if cfg.get("backbone_pretrained"):
        # RootNet's backbone submodule is auto-named (ResNet_0 / HRNet_0)
        dst_key = next(k for k in state.params
                       if k.startswith(("ResNet", "HRNet")))
        state = apply_pretrained_backbone(
            state, cfg.backbone_pretrained, cfg.backbone_name, dst_key,
            tag="/depthnet")

    mesh = train_mesh(cfg)

    keeper = BestCheckpointKeeper(ckpt_folder, cfg.urdf_robot_name,
                                  template="curr_best_root_depth"
                                           "(wholistic)_DATASET_model.pk",
                                  mode="min")
    start_epoch = 0
    if cfg.resume_run:
        resume_path = os.path.join("experiments", cfg.resume_experiment_name,
                                   "ckpt", keeper.paths["dr"].split(os.sep)[-1])
        payload = load_checkpoint_file(resume_path)
        state = restore_state(state, payload)
        start_epoch = int(payload["epoch"]) + 1
        keeper.resume()

    train_step = build_depthnet_train_step(cfg, model, tx)
    eval_step = build_depthnet_eval_step(cfg, model)

    def validate(name, loader, epoch):
        loss_meter = AverageMeter()
        errors = []
        for batch in loader:
            valid = None
            if mesh is not None:
                # pad the final partial batch to shard over the data axis;
                # the mask keeps padded rows out of the error statistics
                batch, n_valid = pad_batch(batch, loader.batch_size)
                batch["_valid"] = (np.arange(loader.batch_size) <
                                   n_valid).astype(np.float32)
                batch = shard_batch(batch, mesh)
                valid = to_host(batch["_valid"]).astype(bool)
            out = eval_step(state, batch)
            # the eval step computes a masked mean over `_valid` (exact
            # unpadded-batch loss); weighting by real rows makes the
            # epoch mean exact too (see validate_full)
            loss_meter.add(float(out["loss"]),
                           n=int(valid.sum()) if valid is not None else 1)
            # to_host: allgathers per-sample errors across hosts on pods
            err = to_host(out["error_depth"])
            errors.extend((err[valid] if valid is not None
                           else err).tolist())
        mean_err = float(np.mean(errors)) if errors else float("inf")
        writer.add_scalar(f"Val/rootz_loss_{name}", loss_meter.mean, epoch)
        writer.add_scalar(f"Val/mean_depth_error_{name}", mean_err, epoch)
        return mean_err

    n_epochs = max_epochs if max_epochs is not None else cfg.n_epochs
    for epoch in range(start_epoch, n_epochs):
        # one host sync per 100 steps, not one per batch (DeviceLogAccumulator)
        acc = DeviceLogAccumulator(flush_every=100)
        # stage batches onto device ahead of the step (transfer/compute
        # overlap; parallel.prefetch_to_device)
        staged = prefetch_to_device(train_loader, mesh,
                                    int(cfg.get("prefetch_batches", 2) or 0))
        for batchid, batch in enumerate(staged):
            if max_steps_per_epoch and batchid >= max_steps_per_epoch:
                break
            rng, step_rng = jax.random.split(rng)
            state, logs = train_step(state, batch, step_rng)
            acc.push(logs)
            if (batchid + 1) % 100 == 0:
                acc.flush()
                writer.add_scalar("Train/loss", acc.mean("loss"),
                                  epoch * steps_per_epoch + batchid + 1)
        acc.flush()
        writer.add_scalar("Train/loss_epoch", acc.mean("loss"), epoch)

        depth_errors = {}
        for name, loader in loaders["test"].items():
            depth_errors[name] = validate(name, loader, epoch)
        keeper.maybe_save(depth_errors, state, epoch)
        print(f"[depthnet] epoch {epoch}: "
              f"train_loss={acc.mean('loss'):.4f} "
              f"depth_errors={depth_errors}")
    writer.close()
    return state
