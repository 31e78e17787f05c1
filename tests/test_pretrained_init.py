"""ImageNet-pretrained backbone initialization wired into training.

Reference parity: the reg backbone ALWAYS starts from ImageNet weights
(/root/reference/lib/models/full_net.py:413-415 -> Resnet.py:69-92,
HRnet.py:572-603, loaded with strict=False). Here the artifact is an explicit
cfg path (`backbone_pretrained` / `rootnet_backbone_pretrained`), either a
raw torch .pth or a tools/convert .msgpack. These tests fabricate a
torchvision-style state dict, wire it through the cfg, train a step, and
assert the backbone actually started from the converted weights.
"""

import os

import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from fixtures import make_synthetic_dream_dataset
from horopose_tpu.config import make_cfg
from horopose_tpu.tools.torch_weights import lenient_merge
from test_torch_weights import synth_torch_resnet50_sd


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    base = tmp_path_factory.mktemp("ws_pre")
    data = base / "dream"
    train_dir = make_synthetic_dream_dataset(data, "panda", n_images=4,
                                             split="train_dr", seed=0)
    return base, train_dir


def _write_cfg(base, train_dir, extra):
    cfg_common = dict(
        exp_name="pretrained_smoke", urdf_robot_name="panda", batch_size=2,
        epoch_size=4, n_epochs=1, n_dataloader_workers=2, image_size=64.0,
        lr=1e-4, clip_gradient=5.0, use_schedule=False)
    cfg_common.update(extra)
    path = base / "cfg_pre.yaml"
    path.write_text(yaml.safe_dump(cfg_common))
    cfg = make_cfg(str(path))
    cfg.train_ds_names = str(train_dir)
    return cfg


def test_lenient_merge_skips_and_counts():
    dst = {"a": {"w": np.zeros((2, 2))}, "b": np.zeros((3,))}
    src = {"a": {"w": np.ones((2, 2)), "extra": np.ones(1)},
           "b": np.ones((4,)),              # shape mismatch -> skipped
           "c": np.ones(1)}                 # missing in dst -> skipped
    out, n, skipped = lenient_merge(dst, src)
    assert n == 1
    np.testing.assert_array_equal(out["a"]["w"], np.ones((2, 2)))
    np.testing.assert_array_equal(out["b"], np.zeros((3,)))  # untouched
    assert len(skipped) == 3  # a/extra, b, c


def test_fullnet_imagenet_init_from_pth(workspace, tmp_path, monkeypatch,
                                        rng):
    """torchvision-style .pth -> cfg.backbone_pretrained -> train one step."""
    import torch
    base, train_dir = workspace
    monkeypatch.chdir(tmp_path)
    sd = synth_torch_resnet50_sd(rng)
    pth = str(base / "resnet50_imagenet.pth")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, pth)

    cfg = _write_cfg(base, train_dir, dict(
        use_rootnet_with_reg_int_shared_backbone=True,
        backbone_name="resnet50", rootnet_backbone_name="resnet34",
        kp3d_loss_weight=10.0, depth_loss_weight=10.0))
    cfg.backbone_pretrained = pth

    from horopose_tpu.core.engine import make_optimizer
    from horopose_tpu.pipelines.common import build_fullnet
    from horopose_tpu.pipelines.train_full import (init_fullnet_state,
                                                   train_full)
    model = build_fullnet(cfg)
    tx = make_optimizer(cfg, 1)
    state, _ = init_fullnet_state(cfg, model, tx)
    want = np.transpose(sd["conv1.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(state.params["reg_backbone"]["conv1"]["kernel"]), want,
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state.batch_stats["reg_backbone"]["bn1"]["mean"]),
        sd["bn1.running_mean"], rtol=1e-6)

    # and the full pipeline picks it up: after 1 tiny-lr step the backbone
    # must still be near the converted weights, not near a fresh random init
    trained = train_full(cfg, max_epochs=1, max_steps_per_epoch=1)
    got = np.asarray(trained.params["reg_backbone"]["conv1"]["kernel"])
    assert np.max(np.abs(got - want)) < 0.01


def test_depthnet_imagenet_init_from_msgpack(workspace, tmp_path,
                                             monkeypatch, rng):
    """tools/convert-produced .msgpack -> depthnet backbone graft."""
    base, train_dir = workspace
    monkeypatch.chdir(tmp_path)
    sd = synth_torch_resnet50_sd(rng)

    from horopose_tpu.models.resnet import get_resnet
    from horopose_tpu.tools.torch_weights import (convert_resnet, merge_into,
                                                  save_msgpack)
    bb = get_resnet("resnet50")
    variables = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        train=False)
    new_vars = merge_into(variables, convert_resnet(sd, (3, 4, 6, 3), True))
    msgpack_path = str(base / "resnet50_imagenet.msgpack")
    save_msgpack(new_vars, msgpack_path)

    cfg = _write_cfg(base, train_dir, dict(
        use_rootnet=True, backbone_name="resnet50", depth_loss_func="l1",
        rootnet_depth_loss_weight=1.0))
    cfg.backbone_pretrained = msgpack_path

    from horopose_tpu.pipelines.train_depthnet import train_depthnet
    state = train_depthnet(cfg, max_epochs=1, max_steps_per_epoch=1)
    dst_key = next(k for k in state.params
                   if k.startswith(("ResNet", "HRNet")))
    want = np.transpose(sd["conv1.weight"], (2, 3, 1, 0))
    got = np.asarray(state.params[dst_key]["conv1"]["kernel"])
    assert np.max(np.abs(got - want)) < 0.01


def test_wrong_backbone_artifact_fails_loudly(workspace, tmp_path,
                                              monkeypatch, rng):
    from flax import serialization
    base, train_dir = workspace
    monkeypatch.chdir(tmp_path)
    junk = str(base / "junk.msgpack")
    with open(junk, "wb") as f:
        f.write(serialization.msgpack_serialize(
            {"params": {"nonsense": np.zeros((1,), np.float32)}}))
    cfg = _write_cfg(base, train_dir, dict(
        use_rootnet=True, backbone_name="resnet34"))
    cfg.backbone_pretrained = junk
    from horopose_tpu.pipelines.train_depthnet import train_depthnet
    with pytest.raises(ValueError, match="ZERO leaves"):
        train_depthnet(cfg, max_epochs=1, max_steps_per_epoch=1)
