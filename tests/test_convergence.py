"""Gradient-path validation: overfitting a single batch must reduce the
loss substantially. Catches sign/scale errors that forward smoke tests
cannot."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fixtures import make_synthetic_dream_dataset
from horopose_tpu.config import make_default_cfg
from horopose_tpu.core.engine import (build_depthnet_train_step,
                                      build_full_train_step,
                                      create_train_state, make_optimizer)
from horopose_tpu.data import DataLoader, DreamDataset
from horopose_tpu.models import FullNet, RootNet
from horopose_tpu import constants as C
from horopose_tpu.pipelines.common import make_robot


@pytest.fixture(scope="module")
def batch(tmp_path_factory):
    d = make_synthetic_dream_dataset(tmp_path_factory.mktemp("c") / "dream",
                                     "panda", n_images=4, split="train_dr",
                                     seed=21)
    ds = DreamDataset(d, color_jitter=False, rgb_augmentation=False,
                      occlusion_augmentation=False,
                      rootnet_resize_hw=(64, 64), other_resize_hw=(64, 64))
    loader = DataLoader(ds, batch_size=4, num_workers=2, drop_last=False)
    b = next(iter(loader))
    return jax.tree.map(jnp.asarray, b)


def test_depthnet_overfits_single_batch(batch):
    cfg = make_default_cfg()
    cfg.image_size = 64.0
    cfg.lr = 1e-4
    cfg.backbone_name = "resnet34"
    model = RootNet(backbone_name="resnet34", input_size=64)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((1, 64, 64, 3)), jnp.ones((1,)),
                           train=False)
    tx = make_optimizer(cfg, 1)
    state = create_train_state(variables, tx)
    step = build_depthnet_train_step(cfg, model, tx)
    losses = []
    for i in range(25):
        state, logs = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(logs["loss"]))
    assert losses[-1] < 0.5 * losses[0], losses[::6]


def test_fullnet_overfits_single_batch(batch):
    cfg = make_default_cfg()
    cfg.image_size = 64.0
    cfg.lr = 3e-4
    cfg.backbone_name = "resnet18"
    cfg.rootnet_backbone_name = "resnet18"
    cfg.p_dropout = 0.0
    cfg.pose_loss_weight = 1.0
    cfg.rot_loss_weight = 1.0
    cfg.trans_loss_weight = 1.0
    cfg.uv_loss_weight = 1.0
    cfg.depth_loss_weight = 10.0
    cfg.kp2d_loss_weight = 10.0
    cfg.kp3d_loss_weight = 10.0
    cfg.kp2d_int_loss_weight = 10.0
    cfg.kp3d_int_loss_weight = 10.0
    robot = make_robot(cfg)
    model = FullNet(robot_type="panda", dof=8, num_keypoints=7,
                    image_size=64, depth_dim=8, backbone_name="resnet18",
                    rootnet_backbone_name="resnet18", p_dropout=0.0,
                    init_pose=tuple(C.initial_joint_vector(
                        "mean", "panda").tolist()))
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((1, 64, 64, 3)),
                           jnp.zeros((1, 64, 64, 3)), jnp.ones((1,)),
                           jnp.eye(3)[None], train=False)
    tx = make_optimizer(cfg, 1)
    state = create_train_state(variables, tx)
    step = build_full_train_step(cfg, model, robot, tx)
    losses = []
    for i in range(30):
        state, logs = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(logs["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.55 * losses[0], losses[::8]
