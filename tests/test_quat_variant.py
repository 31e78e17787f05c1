"""rotation_dim=4 (quaternion) variant through model construction + engine."""

import jax
import jax.numpy as jnp

from horopose_tpu.config import make_default_cfg
from horopose_tpu.pipelines.common import build_fullnet
from horopose_tpu.ops import transforms as T


def test_fullnet_quaternion_rotation():
    cfg = make_default_cfg()
    cfg.image_size = 64.0
    cfg.backbone_name = "resnet50"
    cfg.rootnet_backbone_name = "resnet34"
    cfg.rotation_dim = 4
    model = build_fullnet(cfg)
    assert model.init_rot == (1.0, 0.0, 0.0, 0.0)
    B = 1
    x = jnp.zeros((B, 64, 64, 3))
    k = jnp.full((B,), 1500.0)
    K = jnp.broadcast_to(T.make_K(320.0, 320.0, 32.0, 32.0), (B, 3, 3))
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x, x, k, K,
                           train=False)
    out = model.apply(variables, x, x, k, K, train=False)
    assert out["rot"].shape == (B, 4)
