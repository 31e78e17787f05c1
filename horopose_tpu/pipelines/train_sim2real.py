"""Stage-3 self-supervised sim-to-real fine-tuning.

Parity target: /root/reference/scripts/train_sim2real.py:30-726 — fine-tune
the synth-pretrained FullNet on a real Panda camera set with NO pose labels:
the training signal is the agreement between the differentiable silhouette
render of the predicted pose and a frozen segmentation teacher's mask, plus
an FK<->integral 3D alignment term. Specifics mirrored:
  - losses: mask (mse_mean / bce / 0.001*mse_sum), soft IoU, filtered
    log-scale-ratio (train_sim2real.py:435-468),
  - BatchNorm FROZEN during training (train_sim2real.py:144-148) via the
    frozen_batchnorm trace context,
  - joints detached in the render (urdf_robot.py:270),
  - renders at 0.5 scale (320x240) with scaled K (urdf_robot.py:201-227),
  - best-AUC checkpoint for the matching real set with the epoch guard.

TPU-native: the reference rebuilds the renderer and per-sample meshes every
batch and rasterizes one image at a time (train_sim2real.py:406-416); here
the whole batch is posed by one FK and rasterized in one fused program, and
the seg teacher runs under the same jit.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from horopose_tpu import constants as C
from horopose_tpu.core.checkpoint import (BestCheckpointKeeper,
                                          load_checkpoint_file, restore_state)
from horopose_tpu.core.engine import (TrainState, build_full_eval_step,
                                      make_optimizer, prepare_gt,
                                      _forward)
from horopose_tpu.core.loggers import (AverageMeter, DeviceLogAccumulator,
                                       create_logger)
from horopose_tpu.models.common import frozen_batchnorm
from horopose_tpu.models.deeplab import SegTeacher
from horopose_tpu.kinematics.meshes import (build_robot_mesh,
                                            check_mesh_fidelity)
from horopose_tpu.ops.rasterizer import (render_robot_silhouette,
                                         resolve_faces_per_tile)
from horopose_tpu.parallel import prefetch_to_device, train_mesh
from horopose_tpu.pipelines.common import (build_fullnet, get_dataloaders,
                                           make_pnp_fn, make_robot,
                                           set_seed)
from horopose_tpu.pipelines.train_full import validate_full


def load_seg_teacher(cfg, image_hw=(480, 640)) -> SegTeacher:
    """CtRNet per-camera weights (converted via tools/torch_weights.py).

    A missing teacher is a HARD error by default: sim2real's only training
    signal is the teacher's masks (reference loads real per-camera .pth
    weights unconditionally, mask_inference.py:35-44), so training against a
    random-init teacher burns the whole budget producing garbage. Set
    cfg.allow_random_teacher=True to opt into that explicitly (smoke tests).
    """
    ds = cfg.train_ds_names
    known = ("azure", "kinect", "realsense", "orb")
    camera = next((c for c in known if c in ds), None)
    if camera is None:
        if cfg.get("allow_random_teacher"):
            camera = "azure"  # debug-only: weights are not loaded anyway
        else:
            raise ValueError(
                f"cannot infer the segmentation-teacher camera from "
                f"train_ds_names={ds!r}; the reference trains sim2real only "
                f"on the real Panda camera sets (known cameras: "
                f"{', '.join(known)}). Point train_ds_names at one of them, "
                "or set allow_random_teacher: True for a debug run.")
    path = os.path.join("models", "panda_segmentation", f"{camera}.msgpack")
    teacher = SegTeacher.init_random(jax.random.PRNGKey(0),
                                     image_hw=image_hw)
    if os.path.exists(path):
        from flax import serialization
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        teacher.variables = serialization.from_state_dict(
            teacher.variables, payload)
        print(f"[sim2real] loaded segmentation teacher: {path}")
    elif cfg.get("allow_random_teacher"):
        print(f"[sim2real] WARNING: no converted teacher weights at {path}; "
              "proceeding with a RANDOM teacher because "
              "allow_random_teacher=True (masks are meaningless)")
    else:
        raise FileNotFoundError(
            f"no segmentation teacher weights at {path}. Convert the CtRNet "
            f"checkpoint first (python -m horopose_tpu.tools.convert "
            f"ctrnet_seg {camera}.pth {path}) or set "
            "allow_random_teacher: True to train against a random teacher "
            "(debug only — the self-supervised losses would be garbage).")
    return teacher


def build_sim2real_train_step(cfg, model, robot, robot_mesh, seg_teacher, tx,
                              image_hw=(480, 640)):
    # render at the teacher's output resolution (reference: 0.5 scale,
    # 320x240, urdf_robot.py:201-204)
    out_hw = seg_teacher.out_hw
    render_scale = out_hw[0] / float(image_hw[0])
    ref = int(cfg.reference_keypoint_id)

    def _step(state: TrainState, batch, rng):
        gts = prepare_gt(cfg, robot, batch)

        seg_masks = jax.lax.stop_gradient(
            seg_teacher(batch["images_original"]))         # (B, h, w)

        def loss_fn(params):
            preds, new_bs, _ = _forward(cfg, model, robot, params,
                                        state.batch_stats, batch, gts,
                                        train=True, dropout_rng=rng)
            K_render = batch["K_original"].astype(jnp.float32) * render_scale
            K_render = K_render.at[:, 2, 2].set(1.0)
            pose_for_mesh = gts["gt_pose"] if cfg.known_joint else \
                preds["pose"]
            # tile-culled rasterizer with a measured-best budget ("auto":
            # 1.88x the dense step even on the coarse primitives, 15.8x on
            # fine OBJ meshes — resolve_faces_per_tile). cull_overflow is
            # logged: nonzero means the budget truncated real faces.
            rendered, cull_overflow = render_robot_silhouette(
                robot, robot_mesh, pose_for_mesh, preds["rot"],
                preds["trans"], K_render, out_hw, root=ref, sigma=1.0,
                faces_per_tile=resolve_faces_per_tile(
                    cfg.get("raster_faces_per_tile"),
                    robot_mesh.faces.shape[0]),
                return_overflow=True)

            if cfg.mask_loss_func == "mse_mean":
                loss_mask = jnp.mean((rendered - seg_masks) ** 2)
            elif cfg.mask_loss_func == "bce":
                eps = 1e-6
                r = jnp.clip(rendered, eps, 1 - eps)
                loss_mask = -jnp.mean(seg_masks * jnp.log(r) +
                                      (1 - seg_masks) * jnp.log(1 - r))
            elif cfg.mask_loss_func == "mse_sum":
                loss_mask = 0.001 * jnp.sum((rendered - seg_masks) ** 2)
            else:
                raise NotImplementedError(cfg.mask_loss_func)

            inter = jnp.sum(seg_masks * rendered, axis=(1, 2))
            seg_area = jnp.sum(seg_masks, axis=(1, 2))
            render_area = jnp.sum(rendered, axis=(1, 2))
            union = seg_area + render_area - inter
            loss_iou = 1.0 - jnp.mean(inter / jnp.maximum(union, 1e-9))

            seg_only = seg_area - inter
            render_only = render_area - inter
            scale_ratio = seg_only / jnp.maximum(render_only, 1e-9)
            sr = jax.lax.stop_gradient(scale_ratio)
            ratio_filter = ((sr > 5.0) | (sr < 0.2)).astype(jnp.float32)
            loss_scale = jnp.sum(
                jnp.abs(jnp.log(jnp.maximum(scale_ratio, 1e-9))) *
                ratio_filter) / (jnp.sum(ratio_filter) + 1e-9)

            align_err = jnp.linalg.norm(
                preds["xyz_fk"] - preds["xyz_int"], axis=2)
            loss_align = jnp.mean(align_err)

            loss = (cfg.mask_loss_weight * loss_mask +
                    cfg.iou_loss_weight * loss_iou +
                    cfg.scale_loss_weight * loss_scale +
                    cfg.align_3d_loss_weight * loss_align)
            loss_dict = dict(loss_mask=loss_mask, loss_iou=loss_iou,
                             loss_scale=loss_scale,
                             loss_error3d_align=loss_align,
                             cull_overflow=cull_overflow)
            return loss, (loss_dict, new_bs)

        (loss, (loss_dict, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        return new_state, dict(loss=loss, **loss_dict)

    # BN frozen is baked in at trace time (first call compiles).
    # State donated like the supervised steps (engine.py): callers rebind
    # and must not read the old state after the call.
    with frozen_batchnorm():
        return jax.jit(_step, donate_argnums=(0,))


def _worst_view_ids(eval_step, state, loader, batch_size, n=20):
    """Hardest samples by FK 3D keypoint error, for the per-epoch tracking
    views (reference: validate(get_lowest=True) at epoch 0 picks every 5th
    of the 100 worst view ids, train_sim2real.py:582-592)."""
    import jax.numpy as jnp
    from horopose_tpu.data.samplers import pad_batch
    ids, errs = [], []
    for batch in loader:
        batch, n_valid = pad_batch(batch, batch_size)
        jb = jax.tree.map(jnp.asarray, batch)
        preds, gts, _ = eval_step(state, jb)
        e = np.linalg.norm(np.asarray(preds["xyz_fk"])
                           - np.asarray(gts["gt_keypoints3d"]),
                           axis=-1).mean(axis=1)
        ids.extend(np.asarray(batch["image_id"])[:n_valid].tolist())
        errs.extend(e[:n_valid].tolist())
    order = np.argsort(errs)[::-1]                 # worst first
    picked = order[:100][::5][:n]
    return [int(ids[i]) for i in picked]


def _render_tracked_views(cfg, robot, robot_mesh, seg_teacher, eval_step,
                          state, ds, view_ids, epoch, save_folder,
                          batch_size):
    """Rendered-vs-teacher silhouette stacks for the tracked worst views,
    written each epoch (reference train_sim2real.py:627-634)."""
    import jax.numpy as jnp
    from horopose_tpu.data.samplers import collate, pad_batch
    from horopose_tpu.core.vis import save_silhouette_comparison
    from horopose_tpu.ops.rasterizer import (render_robot_silhouette,
                                             resolve_faces_per_tile)
    if not view_ids:
        return
    prev = ds.return_original_image
    ds.return_original_image = True
    try:
        samples = [ds[i] for i in view_ids]
    finally:
        ds.return_original_image = prev
    out_hw = seg_teacher.out_hw
    track_dir = os.path.join(save_folder, "track")
    # chunks of batch_size: reuse the already-compiled eval step
    for c0 in range(0, len(samples), batch_size):
        chunk = samples[c0:c0 + batch_size]
        batch = collate(chunk)
        originals = batch.pop("images_original")
        batch, n_valid = pad_batch(batch, batch_size)
        preds, _, _ = eval_step(state, jax.tree.map(jnp.asarray, batch))
        masks = np.asarray(seg_teacher(jnp.asarray(originals)))
        scale = out_hw[0] / float(originals.shape[1])
        K_r = np.asarray(batch["K_original"][:n_valid], np.float32) * scale
        K_r[:, 2, 2] = 1.0
        rendered = np.asarray(render_robot_silhouette(
            robot, robot_mesh, jnp.asarray(preds["pose"])[:n_valid],
            jnp.asarray(preds["rot"])[:n_valid],
            jnp.asarray(preds["trans"])[:n_valid], jnp.asarray(K_r), out_hw,
            root=int(cfg.reference_keypoint_id),
            faces_per_tile=resolve_faces_per_tile(
                cfg.get("raster_faces_per_tile"),
                robot_mesh.faces.shape[0])))
        for j, vid in enumerate(view_ids[c0:c0 + n_valid]):
            save_silhouette_comparison(
                rendered[j], masks[j],
                os.path.join(track_dir, f"epoch{epoch:03d}_view{vid}.jpg"))


def train_sim2real(cfg, max_epochs=None, max_steps_per_epoch=None,
                   seg_teacher=None):
    if jax.process_count() > 1:
        # stage 3's pseudo-mask/tracking loops run host-local jits that
        # cannot mix with the globally-replicated train state; the real
        # datasets are ~few-k images, so one host is the right scale.
        # Multi-host training covers stages 1-2 (parallel/multihost.py).
        raise NotImplementedError(
            "sim2real fine-tuning is single-host; run it without "
            "HOROPOSE_DISTRIBUTED / HOROPOSE_COORDINATOR")
    set_seed()
    save_folder, ckpt_folder, _, writer = create_logger(cfg)
    robot = make_robot(cfg)
    robot_mesh = build_robot_mesh(
        robot.model, {n: i for i, n in enumerate(robot.plan.link_names)})
    check_mesh_fidelity(robot_mesh, context="sim2real")

    # real-set loaders need the original full image for the teacher
    cfg_loaders = get_dataloaders(cfg)
    train_loader = cfg_loaders["train"]
    train_loader.dataset.return_original_image = True
    steps_per_epoch = max(len(train_loader), 1)

    if not cfg_loaders["test"]:
        # the real camera sets have no train/test split: validation runs on
        # the matching real set itself (reference: train_sim2real.py:696-700)
        from horopose_tpu.data import DataLoader, DreamDataset
        camera = next((c for c in ("azure", "kinect", "realsense", "orb")
                       if c in cfg.train_ds_names), "real")
        eval_ds = DreamDataset(
            cfg.train_ds_names, color_jitter=False, rgb_augmentation=False,
            occlusion_augmentation=False,
            rootnet_resize_hw=(int(cfg.image_size), int(cfg.image_size)),
            other_resize_hw=(int(cfg.image_size), int(cfg.image_size)),
            extend_ratio=cfg.extend_ratio)
        cfg_loaders["test"][camera] = DataLoader(
            eval_ds, batch_size=cfg.batch_size,
            num_workers=cfg.n_dataloader_workers, drop_last=False)

    model = build_fullnet(cfg)
    tx = make_optimizer(cfg, steps_per_epoch)
    from horopose_tpu.pipelines.train_full import init_fullnet_state
    state, rng = init_fullnet_state(cfg, model, tx)

    start_epoch = 0
    if cfg.resume_run:
        # full-state resume of an interrupted sim2real run (reference
        # train_sim2real.py:108-124: model + optimizer + epoch). Our keeper
        # names sim2real checkpoints per real camera set, so accept those
        # alongside the reference's generic name.
        ckpt_dir = os.path.join("experiments", cfg.resume_experiment_name,
                                "ckpt")
        candidates = ["curr_best_auc(add)_model.pk"] + [
            f"curr_best_auc(add)_{c}_model.pk"
            for c in ("azure", "kinect", "realsense", "orb")]
        resume_path = next(
            (os.path.join(ckpt_dir, c) for c in candidates
             if os.path.exists(os.path.join(ckpt_dir, c))),
            os.path.join(ckpt_dir, candidates[0]))
        payload = load_checkpoint_file(resume_path)
        state = restore_state(state, payload)
        start_epoch = int(payload["epoch"]) + 1
        print(f"[sim2real] resumed {cfg.resume_experiment_name} at epoch "
              f"{start_epoch}")
    elif cfg.pretrained_weight_on_synth:
        from flax import serialization
        payload = load_checkpoint_file(cfg.pretrained_weight_on_synth)
        # WEIGHTS ONLY: the reference re-creates Adam fresh for stage 3
        # (train_sim2real.py:90-99 loads model_state_dict into a model whose
        # optimizer was just constructed) — stage-2 Adam moments and step
        # count must NOT leak into the fine-tune
        state = state.replace(
            params=serialization.from_state_dict(state.params,
                                                 payload["params"]),
            batch_stats=serialization.from_state_dict(
                state.batch_stats, payload["batch_stats"]))
        print(f"[sim2real] loaded synth-pretrained weights (weights only) "
              f"from {cfg.pretrained_weight_on_synth}")
    elif not cfg.get("allow_random_init"):
        # reference parity: refusing to self-train from random init
        # (train_sim2real.py:100-102 `assert 0`)
        raise ValueError(
            "sim2real needs pretrained_weight_on_synth (a stage-2 "
            "checkpoint) or resume_run; self-training from random init "
            "produces garbage. Set allow_random_init: True for debug runs.")

    if seg_teacher is None:
        seg_teacher = load_seg_teacher(cfg)

    keeper = BestCheckpointKeeper(ckpt_folder, cfg.urdf_robot_name)
    if start_epoch:
        keeper.resume()
    train_step = build_sim2real_train_step(cfg, model, robot, robot_mesh,
                                           seg_teacher, tx)
    eval_step = build_full_eval_step(cfg, model, robot,
                                     pnp_fn=make_pnp_fn(cfg.train_ds_names))

    # data-parallel mesh, same knob as train_full/train_depthnet: batch
    # (incl. the teacher's full-res images) sharded, params replicated by jit
    mesh = train_mesh(cfg)

    n_epochs = max_epochs if max_epochs is not None else cfg.n_epochs
    # worst-case tracking views, picked ONCE before training (reference:
    # epoch-0 validate(get_lowest=True), train_sim2real.py:627-634); their
    # rendered-vs-teacher stacks are re-written every epoch under
    # <exp>/track/
    track_n = int(cfg.get("track_worst_n", 20) or 0)
    tracked = {}
    if track_n > 0 and n_epochs > 0:
        for name, loader in cfg_loaders["test"].items():
            tracked[name] = _worst_view_ids(eval_step, state, loader,
                                            cfg.batch_size, n=track_n)
            print(f"[sim2real] tracking worst views on {name}: "
                  f"{tracked[name]}")
    _S2R_TAGS = ("loss", "loss_mask", "loss_iou", "loss_scale",
                 "loss_error3d_align", "cull_overflow")
    for epoch in range(start_epoch, n_epochs):
        # one host sync per 10 steps (the TB cadence here), not per batch
        acc = DeviceLogAccumulator(flush_every=10)
        # stage batches onto device ahead of the step (transfer/compute
        # overlap; parallel.prefetch_to_device)
        staged = prefetch_to_device(train_loader, mesh,
                                    int(cfg.get("prefetch_batches", 2) or 0))
        for batchid, batch in enumerate(staged):
            if max_steps_per_epoch and batchid >= max_steps_per_epoch:
                break
            rng, step_rng = jax.random.split(rng)
            state, logs = train_step(state, batch, step_rng)
            acc.push({t: logs[t] for t in _S2R_TAGS})
            if (batchid + 1) % 10 == 0:
                acc.flush()
                gstep = epoch * steps_per_epoch + batchid + 1
                for t in _S2R_TAGS:
                    writer.add_scalar(f"Train/{t}", acc.mean(t), gstep)
        acc.flush()
        for t in _S2R_TAGS:  # end-of-epoch flush
            writer.add_scalar(f"Train/{t}", acc.mean(t),
                              (epoch + 1) * steps_per_epoch)
        auc_adds = {}
        for name, loader in cfg_loaders["test"].items():
            auc_adds[name] = validate_full(cfg, robot, eval_step, state,
                                           loader, writer, epoch, name, mesh)
            if tracked.get(name):
                try:
                    _render_tracked_views(
                        cfg, robot, robot_mesh, seg_teacher, eval_step,
                        state, loader.dataset, tracked[name], epoch,
                        save_folder, cfg.batch_size)
                except Exception as e:  # tracking must never kill training
                    print(f"[sim2real] tracking render failed: {e}")
        keeper.maybe_save(auc_adds, state, epoch)
        print(f"[sim2real] epoch {epoch}: loss={acc.mean('loss'):.4f} "
              f"mask={acc.mean('loss_mask'):.4f} auc={auc_adds}")
    writer.close()
    return state
