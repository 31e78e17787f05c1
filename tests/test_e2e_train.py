"""End-to-end smoke training: config -> data -> model -> jitted step ->
metrics -> checkpoint, on a fabricated DREAM directory. Mirrors SURVEY.md
section 7 build-plan milestone 5 ("minimum end-to-end slice")."""

import os

import pytest
import yaml

from horopose_tpu.config import make_cfg
from fixtures import make_synthetic_dream_dataset


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    base = tmp_path_factory.mktemp("ws")
    data = base / "dream"
    train_dir = make_synthetic_dream_dataset(data, "panda", n_images=4,
                                             split="train_dr", seed=0)
    test_dir = make_synthetic_dream_dataset(data, "panda", n_images=4,
                                            split="test_dr", seed=1)
    return base, train_dir, test_dir


def _write_cfg(base, train_dir, extra):
    cfg_common = dict(
        exp_name="smoke",
        urdf_robot_name="panda",
        batch_size=2,
        epoch_size=4,
        n_epochs=1,
        n_dataloader_workers=2,
        image_size=64.0,
        lr=1e-4,
        clip_gradient=5.0,
        use_schedule=False,
    )
    cfg_common.update(extra)
    path = base / "cfg.yaml"
    path.write_text(yaml.safe_dump(cfg_common))
    cfg = make_cfg(str(path))
    cfg.train_ds_names = str(train_dir)  # bypass LOCAL_DATA_DIR resolution
    return cfg


def test_depthnet_e2e(workspace, tmp_path, monkeypatch):
    base, train_dir, _ = workspace
    monkeypatch.chdir(tmp_path)
    cfg = _write_cfg(base, train_dir, dict(
        use_rootnet=True, backbone_name="resnet34",
        depth_loss_func="l1", rootnet_depth_loss_weight=1.0))
    from horopose_tpu.pipelines.train_depthnet import train_depthnet
    state = train_depthnet(cfg, max_epochs=1)
    assert int(state.step) == 2  # 4 samples / batch 2
    # checkpoint written for the dr test set
    ckpts = os.listdir(os.path.join("experiments", "smoke", "ckpt"))
    assert any("root_depth" in c for c in ckpts), ckpts
    # scalars logged
    assert os.path.exists(os.path.join("experiments", "smoke", "log",
                                       "scalars.jsonl"))


def test_full_e2e(workspace, tmp_path, monkeypatch):
    base, train_dir, _ = workspace
    monkeypatch.chdir(tmp_path)
    cfg = _write_cfg(base, train_dir, dict(
        use_rootnet_with_reg_int_shared_backbone=True,
        backbone_name="resnet50", rootnet_backbone_name="resnet34",
        pose_loss_weight=1.0, rot_loss_weight=1.0, trans_loss_weight=1.0,
        uv_loss_weight=1.0, depth_loss_weight=10.0, kp2d_loss_weight=10.0,
        kp3d_loss_weight=10.0, kp2d_int_loss_weight=10.0,
        kp3d_int_loss_weight=10.0, align_3d_loss_weight=0.0,
        reference_keypoint_id=3, fix_root=True))
    from horopose_tpu.pipelines.train_full import train_full
    state = train_full(cfg, max_epochs=1)
    assert int(state.step) == 2
    # the scalar log must contain the full AUC battery for the dr set
    log_path = os.path.join("experiments", "smoke", "log", "scalars.jsonl")
    text = open(log_path).read()
    assert "Val/AUC_ADD_dr" in text
    assert "Val/AUC_PCK_integral_xyz_metrics_dr" in text


def test_full_resume(workspace, tmp_path, monkeypatch):
    base, train_dir, _ = workspace
    monkeypatch.chdir(tmp_path)
    cfg = _write_cfg(base, train_dir, dict(
        use_rootnet_with_reg_int_shared_backbone=True,
        backbone_name="resnet50", rootnet_backbone_name="resnet34",
        kp3d_loss_weight=10.0, depth_loss_weight=10.0))
    from horopose_tpu.core.checkpoint import save_checkpoint_file
    from horopose_tpu.pipelines.train_full import train_full
    state = train_full(cfg, max_epochs=1)
    # write a checkpoint as if epoch 0 had been the best, then resume from it
    ckpt = os.path.join("experiments", "smoke", "ckpt",
                        "curr_best_auc(add)_model.pk")
    save_checkpoint_file(ckpt, epoch=0, metric=0.5, state=state)
    cfg.resume_run = True
    cfg.resume_experiment_name = "smoke"
    state2 = train_full(cfg, max_epochs=2)
    assert int(state2.step) >= 4  # 2 steps restored + 2 new
