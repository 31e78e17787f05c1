"""DeepLabV3-ResNet50 segmentation teacher + keypoint head (CtRNet).

Parity target: /root/reference/lib/models/ctrnet/keypoint_seg_resnet.py
(KeyPointSegNet: torchvision deeplabv3_resnet50 with a 1-class classifier,
a ConvTranspose keypoint head + spatial soft-argmax) and
mask_inference.py:13-60 (0.5-scale resize + ImageNet normalization, sigmoid
foreground mask). Used FROZEN as the target-mask producer for the
self-supervised sim2real stage (train_sim2real.py:89,412).

Architecture notes (torchvision deeplabv3_resnet50):
  - ResNet-50 with output stride 8: layer3/layer4 use dilation 2/4 and
    stride 1 (replace_stride_with_dilation=[False, True, True]).
  - ASPP with atrous rates (12, 24, 36), image-level pooling branch,
    project to 256, then 3x3 conv + 1x1 classifier.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from horopose_tpu.models.common import batch_norm

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class DilatedBottleneck(nn.Module):
    filters: int
    strides: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: batch_norm(train, dtype=self.dtype)
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides),
                    padding=self.dilation,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=False, dtype=self.dtype)(y)
        y = nn.relu(norm()(y))
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)
        y = norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * 4, (1, 1),
                               (self.strides, self.strides), use_bias=False,
                               dtype=self.dtype)(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


class DilatedResNet50(nn.Module):
    """ResNet-50 trunk with output stride 8 (dilated layer3/layer4)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(batch_norm(train, dtype=self.dtype, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        stage_sizes = (3, 4, 6, 3)
        strides = (1, 2, 1, 1)
        dilations = (1, 1, 2, 4)
        # torchvision's replace_stride_with_dilation semantics: the FIRST
        # block of a dilated stage keeps the PREVIOUS dilation (resnet.py
        # _make_layer passes previous_dilation to block 0, self.dilation to
        # the rest) — layer3 runs (1,2,2,2,2,2), layer4 runs (2,4,4)
        prev_d = 1
        for stage, (n, s, d) in enumerate(zip(stage_sizes, strides,
                                              dilations)):
            for i in range(n):
                x = DilatedBottleneck(
                    filters=64 * 2 ** stage,
                    strides=s if i == 0 else 1,
                    dilation=prev_d if i == 0 else d, dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}")(x, train=train)
            prev_d = d
        return x  # (B, H/8, W/8, 2048)


class ASPP(nn.Module):
    rates: Sequence[int] = (12, 24, 36)
    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda: batch_norm(train, dtype=self.dtype)
        B, H, W, _ = x.shape
        branches = [nn.relu(norm()(nn.Conv(
            self.channels, (1, 1), use_bias=False, dtype=self.dtype)(x)))]
        for r in self.rates:
            y = nn.Conv(self.channels, (3, 3), padding=r,
                        kernel_dilation=(r, r), use_bias=False,
                        dtype=self.dtype)(x)
            branches.append(nn.relu(norm()(y)))
        # image-level pooling branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.relu(norm()(nn.Conv(self.channels, (1, 1), use_bias=False,
                                   dtype=self.dtype)(g)))
        g = jnp.broadcast_to(g, (B, H, W, self.channels))
        branches.append(g)
        y = jnp.concatenate(branches, axis=-1)
        y = nn.relu(norm()(nn.Conv(self.channels, (1, 1), use_bias=False,
                                   dtype=self.dtype)(y)))
        return y


def _resize_bilinear(x, hw):
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]),
                            method="bilinear")


class KeypointSegNet(nn.Module):
    """Seg mask logits + 2D keypoints, mirroring CtRNet's KeyPointSegNet."""
    num_keypoints: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x (B, H, W, 3) ImageNet-normalized. Returns (keypoints (B, K, 2)
        in pixels, seg logits (B, H, W, 1))."""
        B, H, W, _ = x.shape
        feat = DilatedResNet50(dtype=self.dtype, name="backbone")(
            x, train=train)
        # keypoint branch: deconv to 1/4 + spatial soft-argmax in [-1, 1]
        hm = nn.ConvTranspose(self.num_keypoints, (4, 4), (2, 2),
                              padding="SAME", dtype=self.dtype,
                              name="read_out")(feat)
        Bh, Hh, Wh, K = hm.shape
        flat = hm.reshape(B, Hh * Wh, K)
        probs = jax.nn.softmax(flat.astype(jnp.float32), axis=1)
        ys = jnp.linspace(-1.0, 1.0, Hh)
        xs = jnp.linspace(-1.0, 1.0, Wh)
        gx = jnp.tile(xs[None, :], (Hh, 1)).reshape(-1)
        gy = jnp.tile(ys[:, None], (1, Wh)).reshape(-1)
        x_mean = jnp.einsum("bpk,p->bk", probs, gx)
        y_mean = jnp.einsum("bpk,p->bk", probs, gy)
        kp = jnp.stack([x_mean, y_mean], axis=-1)          # (B, K, 2) [-1,1]
        kp = (kp + 1.0) * jnp.asarray([W // 2, H // 2], jnp.float32)

        y = ASPP(dtype=self.dtype, name="aspp")(feat, train=train)
        y = nn.Conv(256, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="cls_conv")(y)
        y = nn.relu(batch_norm(train, dtype=self.dtype, name="cls_bn")(y))
        y = nn.Conv(1, (1, 1), dtype=self.dtype, name="cls_final")(y)
        seg = _resize_bilinear(y.astype(jnp.float32), (H, W))
        return kp, seg


class SegTeacher:
    """Frozen mask producer: uint8 full images -> sigmoid foreground masks.

    Mirrors seg_mask_inference (mask_inference.py:13-60): 0.5-scale resize,
    ImageNet normalization, sigmoid on the 1-class logits.
    """

    def __init__(self, variables, image_hw=(480, 640), scale: float = 0.5,
                 num_keypoints: int = 7):
        self.model = KeypointSegNet(num_keypoints=num_keypoints)
        self.variables = variables
        self.out_hw = (int(image_hw[0] * scale), int(image_hw[1] * scale))

    def init_random(rng, image_hw=(480, 640), scale=0.5, num_keypoints=7):
        model = KeypointSegNet(num_keypoints=num_keypoints)
        hw = (int(image_hw[0] * scale), int(image_hw[1] * scale))
        # jitted init: one executable, not thousands of tiny dispatches
        # (critical over remote-PJRT; see pipelines/common.py jit_init)
        variables = jax.jit(lambda r: model.init(
            r, jnp.zeros((1, hw[0], hw[1], 3)), train=False))(rng)
        return SegTeacher(variables, image_hw, scale, num_keypoints)
    init_random = staticmethod(init_random)

    def __call__(self, images_uint8: jnp.ndarray) -> jnp.ndarray:
        """images (B, H, W, 3) uint8 -> masks (B, H*scale, W*scale)."""
        x = images_uint8.astype(jnp.float32) / 255.0
        x = _resize_bilinear(x, self.out_hw)
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        _, seg = self.model.apply(self.variables, x, train=False)
        return jax.nn.sigmoid(seg[..., 0])


class CtRNetInference:
    """Full CtRNet-style inference: masks + 2D keypoints + camera-to-robot
    pose via PnP against FK keypoints.

    Parity target: /root/reference/lib/models/ctrnet/CtRNet.py:10-148
    (inference_batch_images: keypoint detection -> BPnP against the robot's
    FK points -> cTr pose). The PnP here is our batched on-device solver.
    """

    def __init__(self, teacher: SegTeacher, robot, scale: float = 0.5):
        self.teacher = teacher
        self.robot = robot
        self.scale = scale

    def __call__(self, images_uint8: jnp.ndarray, joint_angles: jnp.ndarray,
                 K: jnp.ndarray):
        """Returns (masks, keypoints_2d full-res pixels, (R, t))."""
        from horopose_tpu.ops.pnp import pnp
        x = images_uint8.astype(jnp.float32) / 255.0
        x = _resize_bilinear(x, self.teacher.out_hw)
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        kp, seg = self.teacher.model.apply(self.teacher.variables, x,
                                           train=False)
        masks = jax.nn.sigmoid(seg[..., 0])
        kp_full = kp / self.scale                   # back to full-res pixels
        pts3d = self.robot.get_keypoints_only_fk(joint_angles)
        R, t = pnp(kp_full, pts3d, K)
        return masks, kp_full, (R, t)
