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
        reference_keypoint_id=3, allow_random_init=True)
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
    # worst-case tracking views rendered each epoch (reference
    # train_sim2real.py:627-634): red/blue silhouette stacks under track/
    import glob
    tracked = glob.glob(os.path.join("experiments", "s2r_smoke", "track",
                                     "epoch000_view*.jpg"))
    assert tracked, "no worst-case tracking renders written"


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
        reference_keypoint_id=3, raster_faces_per_tile=256,
        allow_random_init=True)
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


def test_sim2real_synth_handoff_is_weights_only(real_ws, tmp_path,
                                                monkeypatch):
    """Stage-2 -> stage-3 handoff parity: the reference loads ONLY
    model_state_dict into a freshly-constructed optimizer
    (train_sim2real.py:90-99) — stage-2 Adam moments and step count must
    not leak into the fine-tune. And without pretrained weights it refuses
    to run (train_sim2real.py:100-102 `assert 0`)."""
    import jax.numpy as jnp
    base, train_dir = real_ws
    monkeypatch.chdir(tmp_path)
    from horopose_tpu.config import make_cfg
    from horopose_tpu.core.checkpoint import save_checkpoint_file
    from horopose_tpu.core.engine import create_train_state, make_optimizer
    from horopose_tpu.models.deeplab import SegTeacher
    from horopose_tpu.pipelines.common import build_fullnet
    from horopose_tpu.pipelines.train_sim2real import train_sim2real
    from flax import serialization

    cfg_yaml = dict(
        exp_name="s2r_handoff", urdf_robot_name="panda", batch_size=2,
        epoch_size=2, n_epochs=1, n_dataloader_workers=2, image_size=64.0,
        lr=1e-6, clip_gradient=5.0, use_schedule=False, use_sim2real=True,
        backbone_name="resnet18", rootnet_backbone_name="resnet18",
        mask_loss_func="mse_mean", mask_loss_weight=1.0, iou_loss_weight=1.0,
        scale_loss_weight=0.0, align_3d_loss_weight=0.0,
        reference_keypoint_id=3)
    path = base / "s2r_handoff.yaml"
    path.write_text(yaml.safe_dump(cfg_yaml))
    cfg = make_cfg(str(path))
    cfg.train_ds_names = str(train_dir)
    teacher = SegTeacher.init_random(jax.random.PRNGKey(0),
                                     image_hw=(480, 640), scale=0.1)

    # no pretrained weights, no resume, no debug flag -> refuse
    with pytest.raises(ValueError, match="pretrained_weight_on_synth"):
        train_sim2real(cfg, max_epochs=0, seg_teacher=teacher)

    # fabricate a stage-2 checkpoint with recognizable params and a
    # DIRTY optimizer state (nonzero step) to prove it is NOT carried over
    model = build_fullnet(cfg)
    rng = jax.random.PRNGKey(5)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((1, 64, 64, 3)),
                           jnp.zeros((1, 64, 64, 3)), jnp.ones((1,)),
                           jnp.eye(3)[None], train=False)
    s2_state = create_train_state(variables, make_optimizer(cfg, 1))
    s2_state = s2_state.replace(step=np.int32(777))
    ckpt = str(base / "synth_ckpt.pk")
    save_checkpoint_file(ckpt, epoch=9, metric=0.5, state=s2_state)

    cfg.pretrained_weight_on_synth = ckpt
    state = train_sim2real(cfg, max_epochs=0, seg_teacher=teacher)
    # weights match the stage-2 checkpoint...
    want = serialization.to_state_dict(s2_state.params)
    got = serialization.to_state_dict(state.params)
    k0 = np.asarray(got["reg_backbone"]["conv1"]["kernel"])
    np.testing.assert_allclose(
        k0, np.asarray(want["reg_backbone"]["conv1"]["kernel"]), rtol=1e-6)
    # ...but the optimizer/step are FRESH
    assert int(state.step) == 0


def test_sim2real_resume_run(real_ws, tmp_path, monkeypatch):
    """resume_run restores the full TrainState (reference
    train_sim2real.py:108-124) and continues at the saved epoch + 1 —
    previously the guard's error message offered resume_run as an
    alternative while no resume logic existed here."""
    import jax.numpy as jnp
    base, train_dir = real_ws
    monkeypatch.chdir(tmp_path)
    from horopose_tpu.config import make_cfg
    from horopose_tpu.models.deeplab import SegTeacher
    from horopose_tpu.pipelines.train_sim2real import train_sim2real
    cfg_yaml = dict(
        exp_name="s2r_resume", urdf_robot_name="panda", batch_size=2,
        epoch_size=2, n_epochs=1, n_dataloader_workers=2, image_size=64.0,
        lr=1e-6, clip_gradient=5.0, use_schedule=False, use_sim2real=True,
        backbone_name="resnet18", rootnet_backbone_name="resnet18",
        mask_loss_func="mse_mean", mask_loss_weight=1.0, iou_loss_weight=1.0,
        scale_loss_weight=0.0, align_3d_loss_weight=0.0,
        reference_keypoint_id=3, allow_random_init=True, track_worst_n=0)
    path = base / "s2r_resume.yaml"
    path.write_text(yaml.safe_dump(cfg_yaml))
    cfg = make_cfg(str(path))
    cfg.train_ds_names = str(train_dir)
    teacher = SegTeacher.init_random(jax.random.PRNGKey(0),
                                     image_hw=(480, 640), scale=0.1)
    # fabricate the interrupted run's best checkpoint (per-camera name, as
    # our keeper writes for sim2real) with a dirty step counter
    from horopose_tpu.core.checkpoint import save_checkpoint_file
    from horopose_tpu.core.engine import create_train_state, make_optimizer
    from horopose_tpu.pipelines.common import build_fullnet
    import jax as _jax
    model = build_fullnet(cfg)
    rng = _jax.random.PRNGKey(8)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((1, 64, 64, 3)),
                           jnp.zeros((1, 64, 64, 3)), jnp.ones((1,)),
                           jnp.eye(3)[None], train=False)
    prev = create_train_state(variables, make_optimizer(cfg, 1))
    prev = prev.replace(step=np.int32(5))
    ckpt_dir = os.path.join("experiments", "s2r_resume", "ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)
    save_checkpoint_file(
        os.path.join(ckpt_dir, "curr_best_auc(add)_azure_model.pk"),
        epoch=0, metric=0.1, state=prev)

    cfg2 = make_cfg(str(path))
    cfg2.train_ds_names = str(train_dir)
    cfg2.resume_run = True
    cfg2.resume_experiment_name = "s2r_resume"
    cfg2.allow_random_init = False   # resume alone must satisfy the guard
    state2 = train_sim2real(cfg2, max_epochs=2, seg_teacher=teacher)
    # resumed at epoch 1 of 2 -> one more epoch of 1 step on top of the
    # restored step counter (5 -> 6)
    assert int(state2.step) == 6
