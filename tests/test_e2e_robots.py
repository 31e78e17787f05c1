"""Cross-robot end-to-end coverage: kuka and baxter through the full
pipeline, plus the CtRNet-style inference wrapper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from horopose_tpu.config import make_cfg
from fixtures import make_synthetic_dream_dataset


@pytest.mark.parametrize("robot_type,dof,nkpt", [("kuka", 7, 8),
                                                 ("baxter", 15, 17)])
def test_full_train_step_other_robots(robot_type, dof, nkpt, tmp_path,
                                      monkeypatch):
    train_dir = make_synthetic_dream_dataset(
        tmp_path / "dream", robot_type, n_images=4, split="train_dr", seed=7)
    monkeypatch.chdir(tmp_path)
    cfg_yaml = dict(
        exp_name=f"{robot_type}_smoke", urdf_robot_name=robot_type,
        batch_size=2, epoch_size=2, n_epochs=1, n_dataloader_workers=2,
        image_size=64.0, lr=1e-4, clip_gradient=5.0,
        use_rootnet_with_reg_int_shared_backbone=True,
        backbone_name="resnet50", rootnet_backbone_name="resnet34",
        pose_loss_weight=1.0, rot_loss_weight=1.0, trans_loss_weight=1.0,
        depth_loss_weight=10.0, kp3d_loss_weight=10.0,
        kp3d_int_loss_weight=10.0, reference_keypoint_id=3)
    path = tmp_path / "cfg.yaml"
    path.write_text(yaml.safe_dump(cfg_yaml))
    cfg = make_cfg(str(path))
    cfg.train_ds_names = str(train_dir)
    from horopose_tpu.pipelines.train_full import train_full
    state = train_full(cfg, max_epochs=1)
    assert int(state.step) == 1


def test_joint_valid_mask_and_known_joint(tmp_path, monkeypatch):
    """use_joint_valid_mask + known_joint engine paths."""
    train_dir = make_synthetic_dream_dataset(
        tmp_path / "dream", "panda", n_images=2, split="train_dr", seed=8)
    monkeypatch.chdir(tmp_path)
    cfg_yaml = dict(
        exp_name="mask_smoke", urdf_robot_name="panda", batch_size=2,
        epoch_size=2, n_epochs=1, n_dataloader_workers=1, image_size=64.0,
        lr=1e-4, clip_gradient=5.0,
        use_rootnet_with_reg_int_shared_backbone=True,
        backbone_name="resnet50", rootnet_backbone_name="resnet34",
        use_joint_valid_mask=True, known_joint=True, fix_mask=True,
        kp3d_loss_weight=10.0, reference_keypoint_id=3)
    path = tmp_path / "cfg.yaml"
    path.write_text(yaml.safe_dump(cfg_yaml))
    cfg = make_cfg(str(path))
    cfg.train_ds_names = str(train_dir)
    from horopose_tpu.pipelines.train_full import train_full
    state = train_full(cfg, max_epochs=1)
    assert int(state.step) == 1


def test_ctrnet_inference_wrapper(rng):
    from horopose_tpu.kinematics import Robot
    from horopose_tpu.models.deeplab import CtRNetInference, SegTeacher
    robot = Robot("panda")
    teacher = SegTeacher.init_random(jax.random.PRNGKey(0),
                                     image_hw=(48, 64), scale=0.5)
    net = CtRNetInference(teacher, robot, scale=0.5)
    images = jnp.asarray(rng.randint(0, 255, (2, 48, 64, 3)), jnp.uint8)
    joints = jnp.zeros((2, 8))
    K = jnp.asarray([[60.0, 0, 32], [0, 60.0, 24], [0, 0, 1]])
    masks, kp2d, (R, t) = net(images, joints, K)
    assert masks.shape == (2, 24, 32)
    assert kp2d.shape == (2, 7, 2)
    assert R.shape == (2, 3, 3) and t.shape == (2, 3)
    # R must be a valid rotation even from garbage keypoints
    eye = np.einsum("bij,bkj->bik", np.asarray(R), np.asarray(R))
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-3)
