"""Sim2real pipeline smoke: self-supervised step end-to-end with a random
teacher on a fabricated "real" DREAM set."""

import os

import jax
import numpy as np
import pytest
import yaml

from horopose_tpu.config import make_cfg
from fixtures import make_synthetic_dream_dataset


@pytest.fixture(scope="module")
def real_ws(tmp_path_factory):
    base = tmp_path_factory.mktemp("s2r")
    train_dir = make_synthetic_dream_dataset(
        base / "dream", "panda", n_images=4, synthetic=False, split="azure",
        seed=3)
    return base, train_dir


def test_sim2real_smoke(real_ws, tmp_path, monkeypatch):
    base, train_dir = real_ws
    monkeypatch.chdir(tmp_path)
    cfg_yaml = dict(
        exp_name="s2r_smoke", urdf_robot_name="panda", batch_size=2,
        epoch_size=4, n_epochs=1, n_dataloader_workers=2, image_size=64.0,
        lr=1e-6, clip_gradient=5.0, use_schedule=False, use_sim2real=True,
        backbone_name="resnet50", rootnet_backbone_name="resnet34",
        mask_loss_func="mse_mean", mask_loss_weight=1.0, iou_loss_weight=1.0,
        scale_loss_weight=0.1, align_3d_loss_weight=1.0,
        reference_keypoint_id=3)
    path = base / "s2r.yaml"
    path.write_text(yaml.safe_dump(cfg_yaml))
    cfg = make_cfg(str(path))
    cfg.train_ds_names = str(train_dir)

    from horopose_tpu.models.deeplab import SegTeacher
    from horopose_tpu.pipelines.train_sim2real import train_sim2real
    # tiny teacher at low res to keep CPU time sane
    teacher = SegTeacher.init_random(jax.random.PRNGKey(0),
                                     image_hw=(480, 640), scale=0.1)
    state = train_sim2real(cfg, max_epochs=1, seg_teacher=teacher)
    assert int(state.step) == 2
    log = os.path.join("experiments", "s2r_smoke", "log", "scalars.jsonl")
    text = open(log).read()
    assert "Train/loss_mask" in text
    assert "Train/loss_iou" in text


def test_seg_teacher_shapes():
    from horopose_tpu.models.deeplab import SegTeacher
    import jax.numpy as jnp
    teacher = SegTeacher.init_random(jax.random.PRNGKey(0),
                                     image_hw=(48, 64), scale=0.5)
    imgs = jnp.zeros((2, 48, 64, 3), jnp.uint8)
    masks = teacher(imgs)
    assert masks.shape == (2, 24, 32)
    assert (np.asarray(masks) >= 0).all() and (np.asarray(masks) <= 1).all()


def test_missing_teacher_hard_fails(real_ws, tmp_path, monkeypatch):
    """A missing seg teacher must abort, not silently train on garbage."""
    base, train_dir = real_ws
    monkeypatch.chdir(tmp_path)
    from horopose_tpu.config import make_default_cfg
    from horopose_tpu.pipelines.train_sim2real import load_seg_teacher
    cfg = make_default_cfg()
    cfg.train_ds_names = str(train_dir)
    with pytest.raises(FileNotFoundError, match="allow_random_teacher"):
        load_seg_teacher(cfg)
    cfg.allow_random_teacher = True
    teacher = load_seg_teacher(cfg)  # explicit opt-in still works
    assert teacher is not None


def test_unresolvable_teacher_camera_hard_fails(tmp_path):
    """A train set whose name matches no known real camera must raise (the
    old silent 'azure' default could train against the WRONG teacher)."""
    from horopose_tpu.config import make_default_cfg
    from horopose_tpu.pipelines.train_sim2real import load_seg_teacher
    cfg = make_default_cfg()
    cfg.train_ds_names = str(tmp_path / "mystery_real_set")
    with pytest.raises(ValueError, match="azure, kinect, realsense, orb"):
        load_seg_teacher(cfg)
    cfg.allow_random_teacher = True
    assert load_seg_teacher(cfg) is not None  # debug escape hatch


def test_sim2real_tiled_rasterizer_smoke(real_ws, tmp_path, monkeypatch):
    """cfg.raster_faces_per_tile > 0 routes the mask render through the
    tile-culled rasterizer and logs the overflow diagnostic."""
    import json
    base, train_dir = real_ws
    monkeypatch.chdir(tmp_path)
    cfg_yaml = dict(
        exp_name="s2r_tiled", urdf_robot_name="panda", batch_size=2,
        epoch_size=2, n_epochs=1, n_dataloader_workers=2, image_size=64.0,
        lr=1e-6, clip_gradient=5.0, use_schedule=False, use_sim2real=True,
        backbone_name="resnet18", rootnet_backbone_name="resnet18",
        mask_loss_func="mse_mean", mask_loss_weight=1.0, iou_loss_weight=1.0,
        scale_loss_weight=0.1, align_3d_loss_weight=1.0,
        reference_keypoint_id=3, raster_faces_per_tile=256)
    path = base / "s2r_tiled.yaml"
    path.write_text(yaml.safe_dump(cfg_yaml))
    cfg = make_cfg(str(path))
    cfg.train_ds_names = str(train_dir)

    from horopose_tpu.models.deeplab import SegTeacher
    from horopose_tpu.pipelines.train_sim2real import train_sim2real
    teacher = SegTeacher.init_random(jax.random.PRNGKey(0),
                                     image_hw=(480, 640), scale=0.1)
    state = train_sim2real(cfg, max_epochs=1, seg_teacher=teacher)
    assert int(state.step) == 1
    log = os.path.join("experiments", "s2r_tiled", "log", "scalars.jsonl")
    tags = [json.loads(line)["tag"] for line in open(log)]
    assert "Train/cull_overflow" in tags
