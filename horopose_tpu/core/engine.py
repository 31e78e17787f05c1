"""Jitted train/eval engine for the full network.

Parity target: /root/reference/lib/core/function.py:19-327 (`farward_loss`):
GT assembly (rot6d from TCO, optional PnP pseudo-GT on real data, root
reframing, k-value computation, joint-validity mean-fill), model forward, the
10 configurable losses, and the weighted sum.

TPU-native design: the whole step — normalization, GT preparation, both
backbones, FK, all losses, backward, optimizer update — is ONE jitted
function. The reference's per-batch Python GT loop (function.py:53-60), the
re-wrapped DataParallel (function.py:100-102) and the per-batch meter syncs
all disappear: batches arrive as uint8 numpy, everything else happens on
device. Data parallelism = shard the batch over a Mesh (parallel/mesh.py);
params stay replicated and XLA inserts the psum for grads.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from horopose_tpu import constants as C
from horopose_tpu.core import losses as L
from horopose_tpu.ops.rotations import (geodesic_distance, rot6d_to_rotmat,
                                        rot_to_rotmat, rotmat_to_quat,
                                        rotmat_to_rot6d)
from horopose_tpu.ops.transforms import k_value_from_bbox, project_points


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(variables, tx) -> TrainState:
    params = variables["params"]
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=variables.get("batch_stats", {}),
                      opt_state=tx.init(params))


# ---------------------------------------------------------------------------
# optimizer / schedule


def schedule_ratio(cfg, epoch: jnp.ndarray) -> jnp.ndarray:
    """Per-epoch LR ratio, matching lib/utils/utils.py:147-189 lambdas."""
    if not cfg.use_schedule:
        return jnp.ones_like(epoch, jnp.float32)
    e = epoch.astype(jnp.float32)
    warm = jnp.asarray(float(cfg.n_epochs_warmup))
    start = float(cfg.start_decay)
    end = float(cfg.end_decay)
    if cfg.schedule_type == "linear":
        final = float(cfg.final_decay)
        decay = (end - final * start - (1.0 - final) * e) / (end - start)
        ratio = jnp.where(e <= start, 1.0, jnp.where(e <= end, decay, final))
    elif cfg.schedule_type == "exponential":
        exponent = float(cfg.exponent)
        ratio = jnp.where(
            e <= start, 1.0,
            exponent ** (jnp.minimum(e, end) - start))
    elif cfg.schedule_type == "everyXepoch":
        stepd = float(cfg.step_decay)
        ratio = stepd ** jnp.floor(jnp.minimum(e, float(cfg.end_decay)) /
                                   float(cfg.step))
    else:
        ratio = jnp.ones_like(e)
    warm_ratio = (e + 1.0) / jnp.maximum(warm, 1.0)
    return jnp.where(e < warm, warm_ratio, ratio)


def make_optimizer(cfg, steps_per_epoch: int) -> optax.GradientTransformation:
    def lr(step):
        epoch = step // max(steps_per_epoch, 1)
        return float(cfg.lr) * schedule_ratio(cfg, epoch)

    components = []
    if cfg.clip_gradient:
        # torch clips by global norm between backward and step
        # (scripts/train_full.py:64-66) — same raw-gradient placement here
        components.append(optax.clip_by_global_norm(float(cfg.clip_gradient)))
    if float(cfg.get("weight_decay", 0.0) or 0.0) > 0:
        # torch.optim.Adam(weight_decay=w) is COUPLED L2: w*param is added
        # to the gradient BEFORE the Adam moments (scripts/train_full.py:42)
        # — not decoupled AdamW. add_decayed_weights before adam matches.
        components.append(optax.add_decayed_weights(float(cfg.weight_decay)))
    components.append(optax.adam(lr))
    return optax.chain(*components)


# ---------------------------------------------------------------------------
# GT preparation (device-side)


def prepare_gt(cfg, robot, batch: Dict, pnp_fn: Optional[Callable] = None
               ) -> Dict:
    """Assemble ground truth on device (function.py:27-114).

    batch values are jnp arrays (images still uint8). pnp_fn, when given,
    computes pseudo-GT rotation from (gt 2D keypoints, FK 3D points, K) on
    real datasets (function.py:67-75).
    """
    TCO = batch["TCO"].astype(jnp.float32)
    gt_pose = batch["jointpose"].astype(jnp.float32)
    gt_keypoints3d = batch["other"]["keypoints_3d"].astype(jnp.float32)
    gt_keypoints2d = batch["other"]["keypoints_2d"].astype(jnp.float32)
    valid_mask = batch["valid_mask"].astype(jnp.float32)
    valid_mask_crop = batch["other"]["valid_mask_crop"].astype(jnp.float32)
    root_K = batch["root"]["K"].astype(jnp.float32)
    K_original = batch["K_original"].astype(jnp.float32)

    rot_dim = int(cfg.rotation_dim)
    if rot_dim == 6:
        gt_rot = rotmat_to_rot6d(TCO[:, :3, :3])
    else:
        gt_rot = rotmat_to_quat(TCO[:, :3, :3])
    gt_trans = TCO[:, :3, 3]

    if pnp_fn is not None:
        # pseudo-GT rotation from PnP on real data (function.py:67-75)
        world_pts = robot.get_keypoints_only_fk(gt_pose)
        R_pnp, _ = pnp_fn(batch["keypoints_2d_original"].astype(jnp.float32),
                          world_pts, K_original)
        gt_rot = rotmat_to_rot6d(R_pnp) if rot_dim == 6 else \
            rotmat_to_quat(R_pnp)

    ref = int(cfg.reference_keypoint_id)
    if ref == 0:
        gt_root_trans = gt_trans
        gt_root_rot = gt_rot
    else:
        gt_root_trans = gt_keypoints3d[:, ref, :]
        gt_root_rot = robot.get_rotation_at_specific_root(
            gt_pose, gt_rot, gt_trans, root=ref)
    gt_root_depth = gt_root_trans[:, 2:3]
    gt_root_uv = gt_keypoints2d[:, ref, 0:2]

    # k value prior (function.py:88-98)
    if cfg.use_extended_bbox:
        bboxes = batch["root"]["bbox_gt2d_extended"].astype(jnp.float32)
        fx, fy = root_K[:, 0, 0], root_K[:, 1, 1]
    elif cfg.use_origin_bbox:
        bboxes = batch["bbox_strict_bounded_original"].astype(jnp.float32)
        fx, fy = K_original[:, 0, 0], K_original[:, 1, 1]
    else:
        bboxes = batch["root"]["bbox_strict_bounded"].astype(jnp.float32)
        fx, fy = root_K[:, 0, 0], root_K[:, 1, 1]
    k_values = k_value_from_bbox(bboxes, jnp.abs(fx), jnp.abs(fy))

    gt_pose_before_mask = gt_pose
    if cfg.use_joint_valid_mask:
        joint_valid = valid_mask[:, jnp.asarray(
            C.JOINT_TO_KP[cfg.urdf_robot_name])]
        mean_joints = jnp.asarray(
            C.initial_joint_vector("mean", cfg.urdf_robot_name))[None]
        gt_pose = gt_pose * joint_valid + mean_joints * (1 - joint_valid)

    return dict(
        gt_pose=gt_pose, gt_pose_before_mask=gt_pose_before_mask,
        gt_rot=gt_rot, gt_root_rot=gt_root_rot, gt_trans=gt_trans,
        gt_root_trans=gt_root_trans, gt_root_depth=gt_root_depth,
        gt_root_uv=gt_root_uv, gt_keypoints3d=gt_keypoints3d,
        gt_keypoints2d=gt_keypoints2d, valid_mask=valid_mask,
        valid_mask_crop=valid_mask_crop, k_values=k_values,
    )


# ---------------------------------------------------------------------------
# losses


def compute_full_losses(cfg, preds: Dict, gts: Dict, other_K: jnp.ndarray,
                        row_mask: Optional[jnp.ndarray] = None
                        ) -> Tuple[jnp.ndarray, Dict]:
    """The 10-loss engine (function.py:191-311).

    row_mask, when given, is the eval pipelines' (B,) `_valid` pad mask:
    every loss becomes a masked mean so a batch padded with duplicated
    rows (for mesh sharding) logs EXACTLY the loss of the unpadded batch.
    Training never pads, so the train step passes None and the compiled
    arithmetic is unchanged.
    """
    image_size = float(cfg.image_size)
    pred_pose = preds["pose"]
    gt_pose = gts["gt_pose"]
    if cfg.known_joint:
        pred_pose = gt_pose
    if cfg.joint_individual_weights is not None:
        jw = jnp.asarray(cfg.joint_individual_weights,
                         jnp.float32).reshape(1, -1)
        pred_pose = pred_pose * jw
        gt_pose = gt_pose * jw

    loss_pose = L.elementwise_loss(cfg.pose_loss_func, pred_pose, gt_pose,
                                   row_mask=row_mask)

    if cfg.rot_loss_func == "mat_mse":
        loss_rot = L.mse(rot6d_to_rotmat(preds["rot"]),
                         rot6d_to_rotmat(gts["gt_root_rot"]),
                         row_mask=row_mask)
    else:
        loss_rot = L.elementwise_loss(cfg.rot_loss_func, preds["rot"],
                                      gts["gt_root_rot"], row_mask=row_mask)

    loss_depth = L.elementwise_loss(cfg.depth_loss_func, preds["depth"],
                                    gts["gt_root_depth"], row_mask=row_mask)

    ref = int(cfg.reference_keypoint_id)
    if cfg.uv_loss_func == "l2norm":
        mask = gts["valid_mask_crop"][:, ref]
        if row_mask is not None:
            mask = mask * row_mask
        err = jnp.linalg.norm(
            (preds["root_uv"] - gts["gt_root_uv"]) / image_size, axis=1)
        loss_uv = jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask != 0), 1)
    else:
        loss_uv = L.elementwise_loss(cfg.uv_loss_func,
                                     preds["root_uv"] / image_size,
                                     gts["gt_root_uv"] / image_size,
                                     row_mask=row_mask)

    if cfg.trans_loss_func == "l2norm":
        loss_trans = L.trans_l2norm_with_outlier_downweight(
            preds["trans"], gts["gt_root_trans"], row_mask=row_mask)
    else:
        loss_trans = L.elementwise_loss(cfg.trans_loss_func, preds["trans"],
                                        gts["gt_root_trans"],
                                        row_mask=row_mask)

    loss_error3d = L.masked_norm_loss(preds["xyz_fk"], gts["gt_keypoints3d"],
                                      row_mask=row_mask)

    kp2d_fk = project_points(other_K, preds["xyz_fk"]) / image_size
    kp2d_int = project_points(other_K, preds["xyz_int"]) / image_size
    gt_kp2d_n = gts["gt_keypoints2d"] / image_size
    vm = gts["valid_mask_crop"]
    loss_error2d = L.masked_norm_loss(kp2d_fk, gt_kp2d_n, vm,
                                      row_mask=row_mask)
    loss_error2d_int = L.masked_norm_loss(kp2d_int, gt_kp2d_n, vm,
                                          row_mask=row_mask)

    loss_error3d_int = L.masked_norm_loss(
        preds["xyz_int"], gts["gt_keypoints3d"],
        vm if cfg.fix_mask else None, row_mask=row_mask)
    loss_error3d_align = L.masked_norm_loss(
        preds["xyz_fk"], preds["xyz_int"], vm if cfg.fix_mask else None,
        row_mask=row_mask)

    loss = (cfg.pose_loss_weight * loss_pose +
            cfg.rot_loss_weight * loss_rot +
            cfg.uv_loss_weight * loss_uv +
            cfg.depth_loss_weight * loss_depth +
            cfg.trans_loss_weight * loss_trans +
            cfg.kp2d_loss_weight * loss_error2d +
            cfg.kp3d_loss_weight * loss_error3d +
            cfg.kp2d_int_loss_weight * loss_error2d_int +
            cfg.kp3d_int_loss_weight * loss_error3d_int +
            cfg.align_3d_loss_weight * loss_error3d_align)

    if cfg.multi_kp:
        gt_kp_depths = gts["gt_keypoints3d"][:, jnp.asarray(
            list(cfg.kps_need_depth)), 2]
        loss_depth_multi = L.l1(preds["depths"], gt_kp_depths,
                                row_mask=row_mask)
        loss = loss + loss_depth_multi

    loss_dict = dict(
        loss_joint=loss_pose, loss_rot=loss_rot, loss_uv=loss_uv,
        loss_depth=loss_depth, loss_trans=loss_trans,
        loss_error2d=loss_error2d, loss_error3d=loss_error3d,
        loss_error2d_int=loss_error2d_int, loss_error3d_int=loss_error3d_int,
        loss_error3d_align=loss_error3d_align,
    )
    return loss, loss_dict


# ---------------------------------------------------------------------------
# step builders


def _normalize_images(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 NHWC -> float32 [0, 1] on device (function.py:27-30)."""
    return x.astype(jnp.float32) / 255.0


def _forward(cfg, model, robot, params, batch_stats, batch, gts, train: bool,
             dropout_rng):
    x_reg = _normalize_images(batch["other"]["images"])
    x_root = _normalize_images(batch["root"]["images"])
    other_K = batch["other"]["K"].astype(jnp.float32)
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        outs, mutated = model.apply(
            variables, x_reg, x_root, gts["k_values"], other_K, train=True,
            rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
        new_batch_stats = mutated["batch_stats"]
    else:
        outs = model.apply(variables, x_reg, x_root, gts["k_values"], other_K,
                           train=False)
        new_batch_stats = batch_stats
    ref = int(cfg.reference_keypoint_id)
    pose_for_fk = gts["gt_pose"] if cfg.known_joint else outs["pose"]
    outs["xyz_fk"] = robot.get_keypoints_root(
        pose_for_fk, outs["rot"], outs["trans"], root=ref)
    return outs, new_batch_stats, other_K


def build_full_train_step(cfg, model, robot, tx,
                          pnp_fn: Optional[Callable] = None):
    """Returns jitted step(state, batch, rng) -> (state, logs).

    The TrainState is donated: params + Adam moments (~600 MB at the
    resnet50+hrnet32 flagship) alias in place instead of allocating fresh
    buffers every step. Callers must rebind (`state, logs = step(state, ...)`)
    and never read the old state object afterwards — every pipeline already
    does. Donation is honored on CPU too (reading a stale state raises
    "Array has been deleted"), so tests comparing two states must build
    both BEFORE stepping either.
    """

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng):
        gts = prepare_gt(cfg, robot, batch, pnp_fn)

        def loss_fn(params):
            preds, new_bs, other_K = _forward(
                cfg, model, robot, params, state.batch_stats, batch, gts,
                train=True, dropout_rng=rng)
            loss, loss_dict = compute_full_losses(cfg, preds, gts, other_K)
            return loss, (loss_dict, new_bs)

        (loss, (loss_dict, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs,
                                  opt_state=new_opt_state)
        logs = dict(loss=loss, **loss_dict)
        return new_state, logs

    return step


def prepare_depth_gt(cfg, batch: Dict) -> Dict:
    """GT for the DepthNet stage (scripts/train_depthnet.py:180-213)."""
    gt_keypoints3d = batch["root"]["keypoints_3d"].astype(jnp.float32)
    root_K = batch["root"]["K"].astype(jnp.float32)
    K_original = batch["K_original"].astype(jnp.float32)
    ref = int(cfg.reference_keypoint_id)
    gt_root_trans = batch["TCO"].astype(jnp.float32)[:, :3, 3] if ref == 0 \
        else gt_keypoints3d[:, ref, :]
    gt_root_depth = gt_root_trans[:, 2:3]
    if cfg.use_extended_bbox:
        bboxes = batch["root"]["bbox_gt2d_extended"].astype(jnp.float32)
        fx, fy = root_K[:, 0, 0], root_K[:, 1, 1]
    elif cfg.use_origin_bbox:
        bboxes = batch["bbox_strict_bounded_original"].astype(jnp.float32)
        fx, fy = K_original[:, 0, 0], K_original[:, 1, 1]
    else:
        bboxes = batch["root"]["bbox_strict_bounded"].astype(jnp.float32)
        fx, fy = root_K[:, 0, 0], root_K[:, 1, 1]
    k_values = k_value_from_bbox(bboxes, jnp.abs(fx), jnp.abs(fy))
    mask = batch["root"]["valid_mask_crop"].astype(jnp.float32)[:, ref:ref + 1]
    return dict(gt_root_trans=gt_root_trans, gt_root_depth=gt_root_depth,
                k_values=k_values, uv_valid_mask=mask)


def _depthnet_forward_loss(cfg, model, params, batch_stats, batch, gts,
                           train: bool, dropout_rng, row_mask=None):
    images = _normalize_images(batch["root"]["images"])
    variables = {"params": params, "batch_stats": batch_stats}
    kwargs = dict(train=train)
    if train:
        out, mutated = model.apply(variables, images, gts["k_values"],
                                   rngs={"dropout": dropout_rng},
                                   mutable=["batch_stats"], **kwargs)
        new_bs = mutated["batch_stats"]
    else:
        out = model.apply(variables, images, gts["k_values"], **kwargs)
        new_bs = batch_stats
    if cfg.use_rootnet_xy_branch:
        pred_depth = out[:, 2:3] / 1000.0
    else:
        pred_depth = out / 1000.0
    loss = L.elementwise_loss(cfg.depth_loss_func, pred_depth,
                              gts["gt_root_depth"], row_mask=row_mask)
    if cfg.use_rootnet_xy_branch:
        m = gts["uv_valid_mask"]
        loss = loss + L.elementwise_loss(
            cfg.xy_loss_func, out[:, 0:2] * m, gts["gt_root_trans"][:, 0:2] * m,
            row_mask=row_mask)
    return loss, pred_depth, new_bs


def build_depthnet_train_step(cfg, model, tx):
    # state donated (see build_full_train_step); callers rebind per step
    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng):
        gts = prepare_depth_gt(cfg, batch)

        def loss_fn(params):
            loss, _, new_bs = _depthnet_forward_loss(
                cfg, model, params, state.batch_stats, batch, gts,
                train=True, dropout_rng=rng)
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs,
                                  opt_state=new_opt_state)
        return new_state, dict(loss=loss)

    return step


def build_depthnet_eval_step(cfg, model):
    @jax.jit
    def evaluate(state: TrainState, batch):
        gts = prepare_depth_gt(cfg, batch)
        # masked mean over the `_valid` pad mask, if the validate loop
        # attached one — the logged loss is exactly the unpadded batch's
        row_mask = batch.get("_valid")
        if row_mask is not None:
            row_mask = row_mask.astype(jnp.float32)
        loss, pred_depth, _ = _depthnet_forward_loss(
            cfg, model, state.params, state.batch_stats, batch, gts,
            train=False, dropout_rng=None, row_mask=row_mask)
        error_depth = jnp.abs(pred_depth[:, 0] - gts["gt_root_depth"][:, 0])
        return dict(loss=loss, error_depth=error_depth,
                    pred_depth=pred_depth)

    return evaluate


def build_full_eval_step(cfg, model, robot, pnp_fn: Optional[Callable] = None):
    """Returns jitted eval(state, batch) -> (preds, gts, logs). Metrics run
    on host over the returned arrays (core/metrics.py)."""

    @jax.jit
    def evaluate(state: TrainState, batch):
        gts = prepare_gt(cfg, robot, batch, pnp_fn)
        preds, _, other_K = _forward(cfg, model, robot, state.params,
                                     state.batch_stats, batch, gts,
                                     train=False, dropout_rng=None)
        # `_valid` is the pad mask the validate loops attach to a final
        # partial batch padded for mesh sharding: masked means make the
        # logged scalars exactly the unpadded batch's loss
        row_mask = batch.get("_valid")
        if row_mask is not None:
            row_mask = row_mask.astype(jnp.float32)
        loss, loss_dict = compute_full_losses(cfg, preds, gts, other_K,
                                              row_mask=row_mask)
        rot_pred_mat = rot_to_rotmat(preds["rot"])
        # reference quirk, reproduced for scalar-level parity: validate()'s
        # rotation_diff compares against the BASE rotation gt_rot
        # (function.py:177-180), even though the loss and the test harness
        # use the root-frame gt_root_rot (test.py:172-177) — verified by
        # test_numeric_parity_engine.py
        rot_gt_mat = rot_to_rotmat(gts["gt_rot"])
        rotation_diff = L.row_mean(
            geodesic_distance(rot_pred_mat, rot_gt_mat), row_mask)
        logs = dict(loss=loss, rotation_diff=rotation_diff, **loss_dict)
        return preds, gts, logs

    return evaluate
