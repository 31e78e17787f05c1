"""Cross-stage weight handoff: a DepthNet checkpoint's backbone must land in
FullNet's rootnet_backbone (reference key remapping, full_net.py:417-430)."""

import numpy as np

import jax
import jax.numpy as jnp

from horopose_tpu.config import make_default_cfg
from horopose_tpu.core.checkpoint import (load_checkpoint_file,
                                          save_checkpoint_file)
from horopose_tpu.core.engine import create_train_state, make_optimizer
from horopose_tpu.models.depth_net import RootNet
from horopose_tpu.pipelines.common import build_fullnet
from horopose_tpu.pipelines.train_full import init_fullnet_state


def test_pretrained_rootnet_handoff(tmp_path):
    # stage 1: a DepthNet with a resnet34 backbone, saved as a checkpoint
    depthnet = RootNet(backbone_name="resnet34", input_size=32)
    rng = jax.random.PRNGKey(7)
    dvars = depthnet.init({"params": rng, "dropout": rng},
                          jnp.zeros((1, 32, 32, 3)), jnp.ones((1,)),
                          train=False)
    cfg1 = make_default_cfg()
    tx1 = make_optimizer(cfg1, 1)
    dstate = create_train_state(dvars, tx1)
    ckpt = str(tmp_path / "depthnet.pk")
    save_checkpoint_file(ckpt, epoch=3, metric=0.01, state=dstate)

    # stage 2: FullNet with the same rootnet backbone arch loads it
    cfg = make_default_cfg()
    cfg.image_size = 32.0
    cfg.backbone_name = "resnet18"
    cfg.rootnet_backbone_name = "resnet34"
    cfg.pretrained_rootnet = ckpt
    model = build_fullnet(cfg)
    tx = make_optimizer(cfg, 1)
    state, _ = init_fullnet_state(cfg, model, tx)

    payload = load_checkpoint_file(ckpt)
    # the depthnet's backbone subtree is auto-named ResNet_0
    src = payload["params"]["ResNet_0"]["conv1"]["kernel"]
    dst = np.asarray(state.params["rootnet_backbone"]["conv1"]["kernel"])
    np.testing.assert_allclose(dst, np.asarray(src))
    # depth layer transfers too
    np.testing.assert_allclose(
        np.asarray(state.params["depth_layer"]["kernel"]),
        np.asarray(payload["params"]["depth_layer"]["kernel"]))
    # batch stats carried over
    np.testing.assert_allclose(
        np.asarray(state.batch_stats["rootnet_backbone"]["bn1"]["mean"]),
        np.asarray(payload["batch_stats"]["ResNet_0"]["bn1"]["mean"]))
