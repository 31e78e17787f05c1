"""Stage-2 supervised full-network training pipeline.

Parity target: /root/reference/scripts/train_full.py:15-124 +
lib/core/function.py:330-417 (validate). Trains FullNet on the synthetic
set, validates per epoch on dr/photo/4-real with the full metric battery
(ADD/PCK AUCs for both FK and integral keypoints, per-keypoint and per-joint
meters, ~40 scalars), and keeps best-AUC checkpoints per dataset.
"""

from __future__ import annotations

import os
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from horopose_tpu import constants as C
from horopose_tpu.core.checkpoint import (BestCheckpointKeeper,
                                          load_checkpoint_file, restore_state)
from horopose_tpu.core.engine import (build_full_eval_step,
                                      build_full_train_step,
                                      create_train_state, make_optimizer)
from horopose_tpu.core.loggers import (AverageMeter, DeviceLogAccumulator,
                                       create_logger)
from horopose_tpu.core.metrics import (ADD_THRESHOLDS_MM, PCK_THRESHOLDS_PX,
                                       compute_metrics_batch, summary_add_pck)
from horopose_tpu.data.samplers import pad_batch
from horopose_tpu.parallel import (prefetch_to_device, shard_batch, to_host,
                                   train_mesh)
from horopose_tpu.pipelines.common import (apply_pretrained_backbone,
                                           build_fullnet, get_dataloaders,
                                           make_pnp_fn, make_robot,
                                           set_seed)

_LOSS_TAGS = ["loss_joint", "loss_rot", "loss_trans", "loss_uv", "loss_depth",
              "loss_error2d", "loss_error3d", "loss_error2d_int",
              "loss_error3d_int", "loss_error3d_align"]


def init_fullnet_state(cfg, model, tx, rng=None):
    rng = rng if rng is not None else jax.random.PRNGKey(C.GLOBAL_SEED)
    # size the init dummies by the actual crop geometry — the reg branch
    # follows other_image_size, the root branch rootnet_image_size
    # (reference: utils.py:77-78); a square cfg.image_size dummy crashes
    # model.init whenever other_image_size != image_size
    from horopose_tpu.pipelines.common import crop_sizes, jit_init
    rootnet_hw, other_hw = crop_sizes(cfg)
    k = jnp.ones((1,))
    K = jnp.eye(3)[None]
    variables = jit_init(model, rng,
                         jnp.zeros((1, *other_hw, 3)),
                         jnp.zeros((1, *rootnet_hw, 3)), k, K)
    state = create_train_state(variables, tx)
    # ImageNet backbone init first (full_net.py:413-415); a stage-1
    # pretrained_rootnet checkpoint below then overrides rootnet_backbone
    if cfg.get("backbone_pretrained"):
        state = apply_pretrained_backbone(
            state, cfg.backbone_pretrained, cfg.backbone_name,
            "reg_backbone", tag="/train_full")
    if cfg.get("rootnet_backbone_pretrained"):
        state = apply_pretrained_backbone(
            state, cfg.rootnet_backbone_pretrained,
            cfg.rootnet_backbone_name, "rootnet_backbone", tag="/train_full")
    if cfg.pretrained_rootnet:
        # cross-stage weight handoff: DepthNet backbone -> rootnet_backbone
        # (reference key remapping at full_net.py:417-430; our module names
        # already coincide, so a subtree copy suffices)
        payload = load_checkpoint_file(cfg.pretrained_rootnet)
        pre = payload["params"]
        params = dict(state.params)
        copied = []
        for src_key, dst_key in (("backbone", "rootnet_backbone"),
                                 ("rootnet_backbone", "rootnet_backbone"),
                                 ("HRNet_0", "rootnet_backbone"),
                                 ("ResNet_0", "rootnet_backbone"),
                                 ("depth_layer", "depth_layer")):
            if src_key in pre and dst_key in params:
                params[dst_key] = pre[src_key]
                copied.append(f"{src_key}->{dst_key}")
        bs = dict(state.batch_stats) if state.batch_stats else {}
        pre_bs = payload.get("batch_stats") or {}
        for src_key, dst_key in (("backbone", "rootnet_backbone"),
                                 ("rootnet_backbone", "rootnet_backbone"),
                                 ("HRNet_0", "rootnet_backbone"),
                                 ("ResNet_0", "rootnet_backbone")):
            if src_key in pre_bs and dst_key in bs:
                bs[dst_key] = pre_bs[src_key]
        print(f"[train_full] loaded pretrained rootnet: {copied}")
        state = state.replace(params=params, batch_stats=bs)
    return state, rng


def validate_full(cfg, robot, eval_step, state, loader, writer, epoch,
                  dsname, mesh=None):
    """Validation with full metric battery (function.py:330-417)."""
    ds = "_" + dsname
    meters = {t: AverageMeter() for t in
              ["loss", "rotation_diff"] + _LOSS_TAGS}
    alldis = defaultdict(list)
    alldis_int = defaultdict(list)
    nk = robot.num_keypoints
    dof = robot.dof
    kp3 = [AverageMeter() for _ in range(nk)]
    kp2 = [AverageMeter() for _ in range(nk)]
    kp3i = [AverageMeter() for _ in range(nk)]
    kp2i = [AverageMeter() for _ in range(nk)]
    jl1 = [AverageMeter() for _ in range(dof)]

    for batch in loader:
        if mesh is not None:
            # the final partial batch cannot shard over the data axis;
            # pad to the full (local) batch by repeating the last row and
            # carry a validity mask so padded rows stay out of the metrics
            batch, n_valid = pad_batch(batch, loader.batch_size)
            batch["_valid"] = (np.arange(loader.batch_size) <
                               n_valid).astype(np.float32)
            batch = shard_batch(batch, mesh)
        preds, gts, logs = eval_step(state, batch)
        valid = (to_host(batch["_valid"]).astype(bool)
                 if mesh is not None else None)
        # the eval step computes masked means over `_valid`, so a padded
        # final batch logs exactly the unpadded batch's loss; weighting the
        # meter by real rows then makes the epoch mean exact too (no-mesh
        # path keeps the reference's equal-batch weighting)
        n_w = int(valid.sum()) if valid is not None else 1
        for t in meters:
            meters[t].add(float(logs[t]), n=n_w)
        # to_host (not np.asarray): on multi-host pods the preds are
        # batch-sharded across processes and must be allgathered so the
        # host-side metric battery sees the full global batch
        np_preds = to_host(preds)
        np_gts = to_host(gts)
        K_orig = to_host(batch["K_original"]).astype(np.float32)
        kp2d_orig = to_host(batch["keypoints_2d_original"]).astype(np.float32)
        if valid is not None:
            np_preds = {k: v[valid] for k, v in np_preds.items()}
            np_gts = {k: v[valid] for k, v in np_gts.items()}
            K_orig, kp2d_orig = K_orig[valid], kp2d_orig[valid]
        m_fk = compute_metrics_batch(
            robot=robot, gt_keypoints3d=np_gts["gt_keypoints3d"],
            gt_keypoints2d=kp2d_orig, K_original=K_orig,
            gt_joint=np_gts["gt_pose_before_mask"],
            pred_keypoints3d=np_preds["xyz_fk"], pred_joint=np_preds["pose"],
            reference_keypoint_id=int(cfg.reference_keypoint_id))
        m_int = compute_metrics_batch(
            robot=robot, gt_keypoints3d=np_gts["gt_keypoints3d"],
            gt_keypoints2d=kp2d_orig, K_original=K_orig,
            gt_joint=np_gts["gt_pose_before_mask"],
            pred_keypoints3d=np_preds["xyz_int"], pred_joint=None,
            reference_keypoint_id=int(cfg.reference_keypoint_id))
        alldis["dis3d"].extend(m_fk["image_dis3d_avg"])
        alldis["dis2d"].extend(m_fk["image_dis2d_avg"])
        alldis["jointerror"].extend(m_fk["image_l1jointerror_avg"])
        alldis_int["dis3d"].extend(m_int["image_dis3d_avg"])
        alldis_int["dis2d"].extend(m_int["image_dis2d_avg"])
        for i in range(nk):
            kp3[i].add(m_fk["batch_dis3d_avg"][i])
            kp2[i].add(m_fk["batch_dis2d_avg"][i])
            kp3i[i].add(m_int["batch_dis3d_avg"][i])
            kp2i[i].add(m_int["batch_dis2d_avg"][i])
        for i in range(dof):
            jl1[i].add(m_fk["batch_l1jointerror_avg"][i])

    summary = summary_add_pck(alldis)
    summary_int = summary_add_pck(alldis_int)
    mean_joint_error = float(np.mean(alldis["jointerror"]) / np.pi * 180.0)

    writer.add_scalar("Val/loss" + ds, meters["loss"].mean, epoch)
    writer.add_scalar("Val/pose_loss" + ds, meters["loss_joint"].mean, epoch)
    writer.add_scalar("Val/rot_loss" + ds, meters["loss_rot"].mean, epoch)
    writer.add_scalar("Val/rot_diff" + ds, meters["rotation_diff"].mean, epoch)
    writer.add_scalar("Val/trans_loss" + ds, meters["loss_trans"].mean, epoch)
    writer.add_scalar("Val/uv_loss" + ds, meters["loss_uv"].mean, epoch)
    writer.add_scalar("Val/depth_loss" + ds, meters["loss_depth"].mean, epoch)
    writer.add_scalar("Val/error2d_loss" + ds, meters["loss_error2d"].mean,
                      epoch)
    writer.add_scalar("Val/error3d_loss" + ds, meters["loss_error3d"].mean,
                      epoch)
    writer.add_scalar("Val/error3d_align_loss" + ds,
                      meters["loss_error3d_align"].mean, epoch)
    writer.add_scalar("Val/mean_joint_error" + ds, mean_joint_error, epoch)
    writer.add_scalar("Val/AUC_ADD" + ds, summary["ADD/AUC"], epoch)
    writer.add_scalar("Val/AUC_PCK" + ds, summary["PCK/AUC"], epoch)
    writer.add_scalar("Val/AUC_ADD_integral_xyz_metrics" + ds,
                      summary_int["ADD/AUC"], epoch)
    writer.add_scalar("Val/AUC_PCK_integral_xyz_metrics" + ds,
                      summary_int["PCK/AUC"], epoch)
    for th in ADD_THRESHOLDS_MM:
        writer.add_scalar(f"Val/ADD_{th}_mm" + ds, summary[f"ADD_{th}_mm"],
                          epoch)
    for th in PCK_THRESHOLDS_PX:
        writer.add_scalar(f"Val/PCK_{th}_pixel" + ds,
                          summary[f"PCK_{th}_pixel"], epoch)
    for i in range(nk):
        writer.add_scalar(f"Val/distance3D_keypoint_{i + 1}" + ds,
                          kp3[i].mean, epoch)
        writer.add_scalar(f"Val/distance2D_keypoint_{i + 1}" + ds,
                          kp2[i].mean, epoch)
    for i in range(dof):
        writer.add_scalar(f"Val/l1error_joint_{i + 1}" + ds, jl1[i].mean,
                          epoch)
    return summary["ADD/AUC"]


def train_full(cfg, max_epochs=None, max_steps_per_epoch=None):
    set_seed()
    save_folder, ckpt_folder, _, writer = create_logger(cfg)
    robot = make_robot(cfg)
    loaders = get_dataloaders(cfg)
    train_loader = loaders["train"]
    steps_per_epoch = max(len(train_loader), 1)

    model = build_fullnet(cfg)
    tx = make_optimizer(cfg, steps_per_epoch)
    state, rng = init_fullnet_state(cfg, model, tx)

    mesh = train_mesh(cfg)

    keeper = BestCheckpointKeeper(ckpt_folder, cfg.urdf_robot_name)
    start_epoch = 0
    if cfg.resume_run:
        resume_path = os.path.join(
            "experiments", cfg.resume_experiment_name, "ckpt",
            "curr_best_auc(add)_model.pk")
        payload = load_checkpoint_file(resume_path)
        state = restore_state(state, payload)
        start_epoch = int(payload["epoch"]) + 1
        keeper.resume()

    # reference keys train AND validation pseudo-GT on the TRAIN set name
    # (function.py:67: `"synth" not in args.train_ds_names`)
    pnp_fn = make_pnp_fn(cfg.train_ds_names)
    train_step = build_full_train_step(cfg, model, robot, tx,
                                       pnp_fn=pnp_fn)
    eval_step = build_full_eval_step(cfg, model, robot, pnp_fn=pnp_fn)

    n_epochs = max_epochs if max_epochs is not None else cfg.n_epochs
    for epoch in range(start_epoch, n_epochs):
        # device-side log accumulation: one host sync per 100 steps (the TB
        # cadence), not one per batch — see DeviceLogAccumulator
        acc = DeviceLogAccumulator(flush_every=100)
        # batches are staged onto device ahead of the step so the
        # host->device transfer overlaps compute (parallel.prefetch_to_device)
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
                gstep = epoch * steps_per_epoch + batchid + 1
                writer.add_scalar("Train/loss", acc.mean("loss"), gstep)
                for t in _LOSS_TAGS:
                    writer.add_scalar(f"Train/{t}", acc.mean(t), gstep)
        acc.flush()
        writer.add_scalar("Train/loss_epoch", acc.mean("loss"), epoch)

        auc_adds = {}
        for name, loader in loaders["test"].items():
            auc_adds[name] = validate_full(cfg, robot, eval_step, state,
                                           loader, writer, epoch, name, mesh)
        keeper.maybe_save(auc_adds, state, epoch)
        print(f"[train_full] epoch {epoch}: loss={acc.mean('loss'):.4f} "
              f"auc_add={auc_adds}")
    writer.close()
    return state
