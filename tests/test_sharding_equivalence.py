"""Data-parallel sharding equivalence: the jitted train step must produce
the same loss and parameter update on 1 device and on an 8-device mesh
(SURVEY.md section 4, natural test seam (h))."""

import jax
import jax.numpy as jnp
import numpy as np

from horopose_tpu import constants as C
from horopose_tpu.config import make_default_cfg
from horopose_tpu.core.engine import (build_full_train_step,
                                      create_train_state, make_optimizer)
from horopose_tpu.kinematics import Robot
from horopose_tpu.models import FullNet
from horopose_tpu.parallel import make_mesh, replicate, shard_batch


def _setup():
    size = 32
    cfg = make_default_cfg()
    cfg.image_size = float(size)
    cfg.backbone_name = "resnet18"
    cfg.rootnet_backbone_name = "resnet18"
    cfg.kp3d_loss_weight = 10.0
    cfg.depth_loss_weight = 10.0
    cfg.pose_loss_weight = 1.0
    cfg.rot_loss_weight = 1.0
    robot = Robot("panda")
    model = FullNet(robot_type="panda", dof=8, num_keypoints=7,
                    image_size=size, depth_dim=8,
                    backbone_name="resnet18",
                    rootnet_backbone_name="resnet18",
                    init_pose=tuple(C.initial_joint_vector(
                        "mean", "panda").tolist()))
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, size, size, 3))
    variables = model.init({"params": rng, "dropout": rng}, dummy, dummy,
                           jnp.ones((1,)), jnp.eye(3)[None], train=False)
    tx = make_optimizer(cfg, 1)
    state = create_train_state(variables, tx)
    step = build_full_train_step(cfg, model, robot, tx)
    return cfg, robot, state, step, size


def _fake_batch(B, size, nk, dof):
    r = np.random.RandomState(3)
    K = np.tile(np.asarray([[100.0, 0, size / 2], [0, 100.0, size / 2],
                            [0, 0, 1]], np.float32)[None], (B, 1, 1))
    crop = dict(
        images=r.randint(0, 255, (B, size, size, 3), dtype=np.uint8),
        K=K,
        keypoints_3d=r.uniform(0.5, 1.5, (B, nk, 3)).astype(np.float32),
        keypoints_2d=r.uniform(0, size, (B, nk, 2)).astype(np.float32),
        valid_mask_crop=np.ones((B, nk), np.float32),
        bbox_strict_bounded=np.tile(np.asarray(
            [2, 2, size - 2, size - 2], np.float32)[None], (B, 1)),
        bbox_gt2d_extended=np.tile(np.asarray(
            [2, 2, size - 2, size - 2], np.float32)[None], (B, 1)),
    )
    return dict(
        TCO=np.tile(np.eye(4, dtype=np.float32)[None], (B, 1, 1)),
        K_original=K.copy(),
        jointpose=r.uniform(-0.5, 0.5, (B, dof)).astype(np.float32),
        keypoints_2d_original=r.uniform(0, 640, (B, nk, 2)).astype(
            np.float32),
        keypoints_3d_original=crop["keypoints_3d"].copy(),
        valid_mask=np.ones((B, nk), np.float32),
        bbox_strict_bounded_original=crop["bbox_strict_bounded"].copy(),
        bbox_gt2d_extended_original=crop["bbox_gt2d_extended"].copy(),
        root=crop, other=dict(crop),
    )


def test_mesh_sharded_step_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    cfg, robot, state, step, size = _setup()
    batch_np = _fake_batch(8, size, robot.num_keypoints, robot.dof)
    rng = jax.random.PRNGKey(1)

    # The train step donates its input state, and the replicated state8's
    # device-0 shards alias state's buffers (device_put does not copy when
    # source and target shard layouts match) — so the single-device branch
    # gets a genuine deep copy and `state` itself is never donated.
    mesh = make_mesh(8)
    state8 = state.replace(step=replicate(state.step, mesh),
                           params=replicate(state.params, mesh),
                           batch_stats=replicate(state.batch_stats, mesh),
                           opt_state=replicate(state.opt_state, mesh))
    batch8 = shard_batch(batch_np, mesh)

    # single device
    batch1 = jax.tree.map(jnp.asarray, batch_np)
    state1_in = jax.tree.map(lambda x: jnp.array(x, copy=True), state)
    state1, logs1 = step(state1_in, batch1, rng)
    state8, logs8 = step(state8, batch8, rng)

    np.testing.assert_allclose(float(logs1["loss"]), float(logs8["loss"]),
                               rtol=1e-4)
    # updated parameters must agree (replicated result == single-device)
    l1 = jax.tree.leaves(state1.params)
    l8 = jax.tree.leaves(state8.params)
    for a, b in zip(l1[:10], l8[:10]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_mesh_sharded_eval_step_matches_single_device():
    """The eval step (pipelines/test.py mesh-sharded eval path): per-sample
    predictions and the loss scalars must match 1-device vs 8-device."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    from horopose_tpu.core.engine import build_full_eval_step
    from horopose_tpu.models import FullNet

    cfg, robot, state, _, size = _setup()
    model = FullNet(robot_type="panda", dof=8, num_keypoints=7,
                    image_size=size, depth_dim=8,
                    backbone_name="resnet18",
                    rootnet_backbone_name="resnet18",
                    init_pose=tuple(C.initial_joint_vector(
                        "mean", "panda").tolist()))
    evaluate = build_full_eval_step(cfg, model, robot)
    batch_np = _fake_batch(8, size, robot.num_keypoints, robot.dof)

    mesh = make_mesh(8)
    state8 = state.replace(step=replicate(state.step, mesh),
                           params=replicate(state.params, mesh),
                           batch_stats=replicate(state.batch_stats, mesh),
                           opt_state=replicate(state.opt_state, mesh))
    batch8 = shard_batch(batch_np, mesh)

    batch1 = jax.tree.map(jnp.asarray, batch_np)
    preds1, gts1, logs1 = evaluate(state, batch1)
    preds8, gts8, logs8 = evaluate(state8, batch8)

    np.testing.assert_allclose(float(logs1["loss"]), float(logs8["loss"]),
                               rtol=1e-4)
    for key in ("xyz_fk", "xyz_int", "pose", "trans"):
        np.testing.assert_allclose(np.asarray(preds1[key]),
                                   np.asarray(preds8[key]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gts1["gt_keypoints3d"]),
                               np.asarray(gts8["gt_keypoints3d"]),
                               atol=2e-5)


def test_mesh_sharded_sim2real_step_matches_single_device():
    """Stage-3 step (rasterizer + frozen seg teacher) under the mesh."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    from horopose_tpu.kinematics.meshes import build_robot_mesh
    from horopose_tpu.models.deeplab import SegTeacher
    from horopose_tpu.pipelines.train_sim2real import \
        build_sim2real_train_step

    cfg, robot, state, _, size = _setup()
    cfg.mask_loss_weight = 1.0
    cfg.iou_loss_weight = 1.0
    cfg.scale_loss_weight = 0.1
    cfg.align_3d_loss_weight = 1.0
    # SGD, not Adam: Adam's step-1 update is lr*sign(g), which amplifies
    # reduction-order float noise on near-zero gradients to a full +-lr flip;
    # with SGD the 1-vs-8-device parameter delta stays proportional to the
    # gradient delta, so the tolerance below is meaningful.
    import optax
    from horopose_tpu.core.engine import create_train_state
    tx = optax.sgd(1e-3)
    state = create_train_state(
        {"params": state.params, "batch_stats": state.batch_stats}, tx)
    robot_mesh = build_robot_mesh(
        robot.model, {n: i for i, n in enumerate(robot.plan.link_names)})
    img_hw = (120, 160)
    teacher = SegTeacher.init_random(jax.random.PRNGKey(0), image_hw=img_hw,
                                     scale=0.25)
    model = FullNet(robot_type="panda", dof=8, num_keypoints=7,
                    image_size=size, depth_dim=8,
                    backbone_name="resnet18",
                    rootnet_backbone_name="resnet18",
                    init_pose=tuple(C.initial_joint_vector(
                        "mean", "panda").tolist()))
    step = build_sim2real_train_step(cfg, model, robot, robot_mesh, teacher,
                                     tx, image_hw=img_hw)

    batch_np = _fake_batch(8, size, robot.num_keypoints, robot.dof)
    batch_np["images_original"] = np.random.RandomState(7).randint(
        0, 255, (8, img_hw[0], img_hw[1], 3), dtype=np.uint8)
    rng = jax.random.PRNGKey(2)

    # donated step + aliasing replicate: deep-copy the single-device input
    # (see test_mesh_sharded_step_matches_single_device)
    mesh = make_mesh(8)
    state8 = state.replace(step=replicate(state.step, mesh),
                           params=replicate(state.params, mesh),
                           batch_stats=replicate(state.batch_stats, mesh),
                           opt_state=replicate(state.opt_state, mesh))
    batch8 = shard_batch(batch_np, mesh)

    batch1 = jax.tree.map(jnp.asarray, batch_np)
    state1_in = jax.tree.map(lambda x: jnp.array(x, copy=True), state)
    state1, logs1 = step(state1_in, batch1, rng)
    state8, logs8 = step(state8, batch8, rng)

    np.testing.assert_allclose(float(logs1["loss"]), float(logs8["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(state1.params)[:10],
                    jax.tree.leaves(state8.params)[:10]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
