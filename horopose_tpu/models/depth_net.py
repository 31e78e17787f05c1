"""DepthNet (RootNet): absolute root-depth estimation from a crop.

Parity target: /root/reference/lib/models/depth_net.py:11-168. Backbone ->
global-average-pooled feature -> 1x1 conv "depth layer" producing a scalar
gamma; depth = gamma * k_value where k is the camera-geometry prior computed
in the pipeline. Optional xy soft-argmax branch (depth_net.py:34-42,100-111),
fc bottleneck (44-54, 114-120) and offset head (63-70, 127-131). Output is in
millimetres; pipelines divide by 1000 (train_depthnet.py:224-232).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from horopose_tpu.models.common import batch_norm
from horopose_tpu.models.hrnet import get_hrnet
from horopose_tpu.models.resnet import get_resnet


class RootNet(nn.Module):
    backbone_name: str = "resnet50"
    pred_xy: bool = False
    use_offset: bool = False
    add_fc: bool = False
    input_size: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, k_value, train: bool = True):
        """x (B, H, W, 3) normalized crop; k_value (B,) or (B, 1).

        Returns depth (B, 1) in mm, or (B, 3) [x, y, depth] with pred_xy.
        """
        if self.backbone_name in ("resnet", "resnet34", "resnet50"):
            fm = get_resnet(self.backbone_name, self.dtype)(x, train=train)
            img_feat = jnp.mean(fm, axis=(1, 2))          # (B, C)
        elif self.backbone_name in ("hrnet", "hrnet32"):
            img_feat = get_hrnet(32, generate_hm=False, generate_feat=True,
                                 dtype=self.dtype)(x, train=train)
        else:
            raise NotImplementedError(self.backbone_name)
        inplanes = img_feat.shape[-1]

        coord_xy = None
        if self.pred_xy:
            y = fm
            for i in range(3):
                y = nn.ConvTranspose(256, (4, 4), (2, 2), padding="SAME",
                                     use_bias=False, dtype=self.dtype,
                                     name=f"deconv{i}")(y)
                y = batch_norm(train, dtype=self.dtype, name=f"deconv{i}_bn")(y)
                y = nn.relu(y)
            hm = nn.Conv(1, (1, 1), dtype=self.dtype, name="xy_layer")(y)
            B, H, W, _ = hm.shape
            probs = nn.softmax(hm.reshape(B, H * W, 1), axis=1).reshape(B, H, W)
            hm_x = probs.sum(axis=1)                       # (B, W)
            hm_y = probs.sum(axis=2)                       # (B, H)
            coord_x = (hm_x * jnp.arange(W, dtype=jnp.float32)).sum(-1)
            coord_y = (hm_y * jnp.arange(H, dtype=jnp.float32)).sum(-1)
            coord_xy = jnp.stack([coord_x, coord_y], axis=-1)

        if self.add_fc:
            f1 = nn.relu(batch_norm(train, name="fc1_bn")(
                nn.Dense(inplanes // 2, name="fc1")(img_feat)))
            f2 = nn.relu(batch_norm(train, name="fc2_bn")(
                nn.Dense(inplanes // 4, name="fc2")(f1)))
            f3 = nn.relu(batch_norm(train, name="fc3_bn")(
                nn.Dense(inplanes // 4, name="fc3")(f2)))
            f4 = nn.relu(batch_norm(train, name="fc4_bn")(
                nn.Dense(inplanes // 2, name="fc4")(f3)))
            f5 = nn.Dense(inplanes, name="fc5")(f4)
            img_feat = img_feat + f5

        # 1x1 conv on a (1,1) map == Dense; init matches reference's
        # normal(std=0.001) + zero bias (depth_net.py:152-156)
        gamma = nn.Dense(
            1, kernel_init=nn.initializers.normal(0.001),
            bias_init=nn.initializers.zeros, name="depth_layer")(img_feat)
        depth = gamma * jnp.reshape(k_value, (-1, 1))
        if self.use_offset:
            offset = nn.Dense(
                1, kernel_init=nn.initializers.normal(0.001),
                bias_init=nn.initializers.zeros, name="offset_layer")(img_feat)
            depth = depth + offset * 1000.0
        if self.pred_xy:
            return jnp.concatenate([coord_xy, depth], axis=-1)
        return depth
