"""Eval harness end-to-end: evaluate a CONVERTED reference-style checkpoint
through test_network on a fabricated DREAM set.

Covers the accuracy-parity workflow (VERDICT item 4b): the moment the
reference model-zoo weights + DREAM data are mountable, the 0.5-AUC
comparison runs as
  python -m horopose_tpu.tools.convert fullnet <ref.pk> <converted.pk>
  python scripts/test.py --exp_path <exp> --dataset <set> --ckpt <converted.pk>
This test drives exactly that path with a fabricated reference state dict
(reference metric surface: /root/reference/scripts/test.py:244-274), and
checks the reconciled runtime reporting (bench.py-methodology FPS + separate
transfer/metrics line).
"""

import os

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from fixtures import make_synthetic_dream_dataset
from test_fullnet_converter import synth_fullnet_sd


@pytest.fixture(scope="module")
def eval_ws(tmp_path_factory):
    base = tmp_path_factory.mktemp("evalws")
    test_dir = make_synthetic_dream_dataset(base / "dream", "panda",
                                            n_images=4, split="test_dr",
                                            seed=5)
    return base, str(test_dir)


def test_eval_converted_reference_checkpoint(eval_ws, tmp_path, monkeypatch,
                                             rng):
    base, test_dir = eval_ws
    monkeypatch.chdir(tmp_path)

    # experiment dir with the saved config (test.py rebuilds cfg from it)
    exp_path = os.path.join(str(base), "experiments", "ref_eval")
    os.makedirs(os.path.join(exp_path, "ckpt"), exist_ok=True)
    with open(os.path.join(exp_path, "config.yaml"), "w") as f:
        yaml.safe_dump(dict(
            exp_name="ref_eval", urdf_robot_name="panda", image_size=64.0,
            backbone_name="resnet50", rootnet_backbone_name="hrnet32",
            reference_keypoint_id=3, fix_root=True), f)

    # fabricate the reference RootNetwithRegInt state dict and convert it —
    # the same flow as `tools/convert fullnet <model-zoo .pk> <out.pk>`
    from horopose_tpu.pipelines.common import build_fullnet
    from horopose_tpu.pipelines.test import make_test_cfg, test_network
    from horopose_tpu.tools.torch_weights import (
        convert_fullnet_reference_checkpoint, merge_into, save_msgpack)

    cfg = make_test_cfg(exp_path, test_dir)
    model = build_fullnet(cfg)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key},
                           jnp.zeros((1, 64, 64, 3)),
                           jnp.zeros((1, 64, 64, 3)), jnp.ones((1,)),
                           jnp.eye(3)[None], train=False)
    sd = synth_fullnet_sd(rng)
    tb = convert_fullnet_reference_checkpoint(sd, "resnet50", "hrnet32")
    converted = os.path.join(str(base), "converted_ref.pk")
    save_msgpack(merge_into(variables, tb), converted)

    summary = test_network(cfg, ckpt_name=converted, batch_size=4)
    assert "ADD/AUC" in summary and 0.0 <= summary["ADD/AUC"] <= 1.0

    text = open(os.path.join(exp_path, "result", "summary.txt")).read()
    # the reference's named metric surface (scripts/test.py:244-274)
    for needle in ("ADD/AUC:", "PCK/AUC:", "ADD<10mm:", "ADD_2d<2.5pixel:",
                   "Joint_l1_error/mean (degree):",
                   "Rotation_l1_error/mean (degree):",
                   "KeypointNet_2d_distance/mean (pixel):",
                   "Runtime of rootnet:",
                   "Runtime of regression+integral:",
                   "Runtime of all:",
                   "time_image.mean-time_other.mean:",
                   "FPS_parallel:", "FPS:"):
        assert needle in text, needle
    # reconciled runtime reporting: forward FPS (bench methodology) and the
    # host-side loop cost are separate lines
    assert "Runtime of eval loop per image" in text
    assert os.path.exists(os.path.join(exp_path, "result",
                                       "add_distribution.json"))
    # converted weights actually loaded: the evaluated model's conv1 must be
    # the transposed torch tensor, not random init
    want = np.transpose(sd["reg_backbone.conv1.weight"], (2, 3, 1, 0))
    got = np.asarray(merge_into(variables, tb)["params"]
                     ["reg_backbone"]["conv1"]["kernel"])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_eval_harness_mesh_sharding_matches_single_device(eval_ws, tmp_path,
                                                          monkeypatch):
    """cfg.mesh_shape shards eval batches over the data mesh; metrics must
    be identical to the single-device run (same deterministic init)."""
    base, test_dir = eval_ws
    monkeypatch.chdir(tmp_path)
    exp_path = os.path.join(str(base), "experiments", "mesh_eval")
    os.makedirs(os.path.join(exp_path, "ckpt"), exist_ok=True)
    with open(os.path.join(exp_path, "config.yaml"), "w") as f:
        yaml.safe_dump(dict(
            exp_name="mesh_eval", urdf_robot_name="panda", image_size=64.0,
            backbone_name="resnet18", rootnet_backbone_name="resnet18",
            reference_keypoint_id=3, fix_root=True), f)

    from horopose_tpu.pipelines.test import make_test_cfg, test_network

    cfg1 = make_test_cfg(exp_path, test_dir)
    s1 = test_network(cfg1, ckpt_name="absent.pk", batch_size=4)

    cfg8 = make_test_cfg(exp_path, test_dir)
    cfg8.mesh_shape = [4]
    s8 = test_network(cfg8, ckpt_name="absent.pk", batch_size=4)

    assert abs(s1["ADD/AUC"] - s8["ADD/AUC"]) < 1e-6, (s1["ADD/AUC"],
                                                       s8["ADD/AUC"])
    assert abs(s1["PCK/AUC"] - s8["PCK/AUC"]) < 1e-4


def test_eval_harness_mesh_indivisible_batch_raises(eval_ws, tmp_path,
                                                    monkeypatch):
    base, test_dir = eval_ws
    monkeypatch.chdir(tmp_path)
    exp_path = os.path.join(str(base), "experiments", "mesh_eval2")
    os.makedirs(exp_path, exist_ok=True)
    with open(os.path.join(exp_path, "config.yaml"), "w") as f:
        yaml.safe_dump(dict(
            exp_name="mesh_eval2", urdf_robot_name="panda",
            image_size=64.0, backbone_name="resnet18",
            rootnet_backbone_name="resnet18", reference_keypoint_id=3), f)
    from horopose_tpu.pipelines.test import make_test_cfg, test_network
    cfg = make_test_cfg(exp_path, test_dir)
    cfg.mesh_shape = [8]
    with pytest.raises(ValueError, match="not divisible"):
        test_network(cfg, ckpt_name="absent.pk", batch_size=4)
