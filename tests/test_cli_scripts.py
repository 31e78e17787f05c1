"""The user-facing CLI surface (BASELINE.json demands API compatibility):
`scripts/train.py --config <yaml>` flag-priority dispatch and
`scripts/test.py --exp_path --dataset` incl. the DREAM set-name resolution.
Reference: /root/reference/scripts/train.py:13-37, test.py:400-409.
"""

import importlib.util
import os
import sys

import pytest
import yaml

from fixtures import make_synthetic_dream_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(script):
    spec = importlib.util.spec_from_file_location(
        f"cli_{script}", os.path.join(REPO, "scripts", f"{script}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    base = tmp_path_factory.mktemp("cli")
    train_dir = make_synthetic_dream_dataset(base / "dream", "panda",
                                             n_images=4, split="train_dr",
                                             seed=11)
    return base, train_dir


def test_train_cli_depthnet_dispatch(ws, tmp_path, monkeypatch):
    base, train_dir = ws
    cfg_path = base / "depthnet.yaml"
    cfg_path.write_text(yaml.safe_dump(dict(
        exp_name="cli_depthnet", urdf_robot_name="panda", batch_size=2,
        epoch_size=4, n_epochs=1, n_dataloader_workers=1, image_size=64.0,
        lr=1e-4, use_rootnet=True, backbone_name="resnet34",
        depth_loss_func="l1", rootnet_depth_loss_weight=1.0,
        train_ds_names=str(train_dir))))
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv",
                        ["train.py", "--config", str(cfg_path)])
    _load("train").main()
    exp = os.path.join("experiments", "cli_depthnet")
    assert os.path.exists(os.path.join(exp, "config.yaml"))
    assert os.path.exists(os.path.join(exp, "log", "scalars.jsonl"))


def test_train_cli_no_pipeline_flag_raises(ws, tmp_path, monkeypatch):
    base, _ = ws
    cfg_path = base / "noflag.yaml"
    cfg_path.write_text(yaml.safe_dump(dict(
        exp_name="noflag", urdf_robot_name="panda")))
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(sys, "argv",
                        ["train.py", "--config", str(cfg_path)])
    with pytest.raises(ValueError, match="no pipeline selected"):
        _load("train").main()


def test_test_cli_dataset_name_resolution(ws, tmp_path, monkeypatch):
    """--dataset takes a bare DREAM set name resolved under the data dir."""
    base, _ = ws
    test_dir = make_synthetic_dream_dataset(base / "dream2", "panda",
                                            n_images=2, split="test_dr",
                                            seed=12)
    # lay out <data>/dream/synthetic/<name> as the resolver expects
    data_root = tmp_path / "data"
    target = data_root / "dream" / "synthetic" / "panda_synth_test_dr"
    target.parent.mkdir(parents=True)
    os.symlink(test_dir, target)

    exp_path = str(base / "experiments" / "cli_eval")
    os.makedirs(os.path.join(exp_path, "ckpt"), exist_ok=True)
    with open(os.path.join(exp_path, "config.yaml"), "w") as f:
        yaml.safe_dump(dict(
            exp_name="cli_eval", urdf_robot_name="panda", image_size=64.0,
            backbone_name="resnet18", rootnet_backbone_name="resnet18",
            reference_keypoint_id=3), f)

    monkeypatch.chdir(tmp_path)
    mod = _load("test")
    monkeypatch.setattr(mod, "LOCAL_DATA_DIR", str(data_root))
    monkeypatch.setattr(sys, "argv", [
        "test.py", "--exp_path", exp_path,
        "--dataset", "panda_synth_test_dr", "--batch_size", "2"])
    mod.main()
    assert os.path.exists(os.path.join(exp_path, "result", "summary.txt"))
