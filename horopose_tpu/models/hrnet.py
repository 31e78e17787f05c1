"""HRNet (pose_hrnet) in Flax, NHWC.

Parity target: /root/reference/lib/models/backbones/HRnet.py:101-623 —
PoseHighResolutionNet w32/w48: stem, Bottleneck layer1, three multi-branch
high-resolution stages with fuse layers, optional heatmap head
(num_joints*depth_dim channels from the high-res branch, HRnet.py:330-337)
and optional classification head producing a 2048-d feature
(HRnet.py:341-388).

Stage configuration matches backbones/configs/hrnet_w32.yaml: stage2 (1
module, 2 branches), stage3 (4 modules, 3 branches), stage4 (3 modules, 4
branches), BasicBlocks, SUM fusion.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from horopose_tpu.models.common import batch_norm
from horopose_tpu.models.resnet import BasicBlock, Bottleneck


def _upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


class FuseLayer(nn.Module):
    """Fuse multi-resolution branch outputs by summation (SUM method)."""
    in_channels: Sequence[int]
    out_branches: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = True):
        norm = lambda name: batch_norm(train, dtype=self.dtype, name=name)
        outs = []
        for i in range(self.out_branches):
            acc = None
            for j, x in enumerate(xs):
                if j > i:
                    y = nn.Conv(self.in_channels[i], (1, 1), use_bias=False,
                                dtype=self.dtype, name=f"up{i}_{j}")(x)
                    y = norm(f"up{i}_{j}_bn")(y)
                    y = _upsample_nearest(y, 2 ** (j - i))
                elif j == i:
                    y = x
                else:
                    y = x
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.in_channels[i] if last else self.in_channels[j]
                        y = nn.Conv(ch, (3, 3), (2, 2), padding=1,
                                    use_bias=False, dtype=self.dtype,
                                    name=f"down{i}_{j}_{k}")(y)
                        y = norm(f"down{i}_{j}_{k}_bn")(y)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class HighResolutionModule(nn.Module):
    num_branches: int
    num_blocks: int
    channels: Sequence[int]
    multi_scale_output: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = True):
        ys = []
        for b in range(self.num_branches):
            y = xs[b]
            for i in range(self.num_blocks):
                y = BasicBlock(filters=self.channels[b], dtype=self.dtype,
                               name=f"branch{b}_block{i}")(y, train=train)
            ys.append(y)
        out_branches = self.num_branches if self.multi_scale_output else 1
        return FuseLayer(in_channels=self.channels, out_branches=out_branches,
                         dtype=self.dtype, name="fuse")(ys, train=train)


class TransitionLayer(nn.Module):
    """Adapt previous stage branch channels / add one deeper branch."""
    prev_channels: Sequence[int]
    new_channels: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = True):
        norm = lambda name: batch_norm(train, dtype=self.dtype, name=name)
        outs = []
        for i, ch in enumerate(self.new_channels):
            if i < len(self.prev_channels):
                if ch != self.prev_channels[i]:
                    y = nn.Conv(ch, (3, 3), padding=1, use_bias=False,
                                dtype=self.dtype, name=f"t{i}")(xs[i])
                    y = norm(f"t{i}_bn")(y)
                    outs.append(nn.relu(y))
                else:
                    outs.append(xs[i])
            else:
                y = xs[-1]
                for j in range(i + 1 - len(self.prev_channels)):
                    out_ch = ch if j == i - len(self.prev_channels) else \
                        self.prev_channels[-1]
                    y = nn.Conv(out_ch, (3, 3), (2, 2), padding=1,
                                use_bias=False, dtype=self.dtype,
                                name=f"t{i}_d{j}")(y)
                    y = norm(f"t{i}_d{j}_bn")(y)
                    y = nn.relu(y)
                outs.append(y)
        return outs


class HRNet(nn.Module):
    """Pose HRNet. Input (B, H, W, 3).

    Returns, depending on flags (mirroring HRnet.py:500-560):
      generate_hm and generate_feat -> (heatmap (B,H/4,W/4,K*D), feat (B,2048))
      generate_hm only              -> heatmap
      generate_feat only            -> feat
    """
    width: int = 32                     # w32 | w48
    num_joints: int = 7
    depth_dim: int = 64
    generate_hm: bool = True
    generate_feat: bool = True
    dtype: Any = jnp.float32
    # jax.checkpoint per layer1-Bottleneck / HighResolutionModule: the
    # backward pass recomputes each unit's internals instead of storing
    # them (cfg.remat — trades forward FLOPs for activation HBM)
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        w = self.width
        bottleneck_cls, module_cls = Bottleneck, HighResolutionModule
        if self.remat:  # train passed positionally below (static arg)
            bottleneck_cls = nn.remat(Bottleneck, static_argnums=(2,))
            module_cls = nn.remat(HighResolutionModule, static_argnums=(2,))
        norm = lambda name=None: batch_norm(train, dtype=self.dtype,
                                            name=name)
        # stem (1/4 resolution)
        x = nn.Conv(64, (3, 3), (2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(norm("bn1")(x))
        x = nn.Conv(64, (3, 3), (2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(x)
        x = nn.relu(norm("bn2")(x))
        for i in range(4):
            x = bottleneck_cls(filters=64, dtype=self.dtype,
                               name=f"layer1_{i}")(x, train)

        c2 = [w, 2 * w]
        c3 = [w, 2 * w, 4 * w]
        c4 = [w, 2 * w, 4 * w, 8 * w]
        xs = TransitionLayer([256], c2, dtype=self.dtype,
                             name="transition1")([x], train=train)
        xs = module_cls(2, 4, c2, dtype=self.dtype,
                        name="stage2_m0")(xs, train)
        xs = TransitionLayer(c2, c3, dtype=self.dtype,
                             name="transition2")(xs, train=train)
        for m in range(4):
            xs = module_cls(3, 4, c3, dtype=self.dtype,
                            name=f"stage3_m{m}")(xs, train)
        xs = TransitionLayer(c3, c4, dtype=self.dtype,
                             name="transition3")(xs, train=train)
        for m in range(3):
            last = m == 2
            xs = module_cls(
                4, 4, c4, multi_scale_output=(self.generate_feat or not last),
                dtype=self.dtype, name=f"stage4_m{m}")(xs, train)

        outputs: Tuple = ()
        if self.generate_hm:
            hm = nn.Conv(self.num_joints * self.depth_dim, (1, 1),
                         dtype=self.dtype, name="final_layer")(xs[0])
            outputs += (hm,)
        if self.generate_feat:
            head_channels = [32, 64, 128, 256]
            y = bottleneck_cls(filters=head_channels[0], dtype=self.dtype,
                               name="incre0")(xs[0], train)
            for i in range(3):
                incre = bottleneck_cls(filters=head_channels[i + 1],
                                       dtype=self.dtype,
                                       name=f"incre{i + 1}")(xs[i + 1], train)
                y = nn.Conv(head_channels[i + 1] * 4, (3, 3), (2, 2),
                            padding=1, dtype=self.dtype,
                            name=f"downsamp{i}")(y)
                y = nn.relu(norm(f"downsamp{i}_bn")(y))
                y = incre + y
            y = nn.Conv(2048, (1, 1), dtype=self.dtype, name="final_feat")(y)
            y = nn.relu(norm("final_feat_bn")(y))
            feat = jnp.mean(y, axis=(1, 2))  # global average pool -> (B, 2048)
            outputs += (feat,)
        return outputs if len(outputs) > 1 else outputs[0]


def get_hrnet(width: int = 32, num_joints: int = 7, depth_dim: int = 64,
              generate_hm: bool = True, generate_feat: bool = True,
              dtype=jnp.float32, name: str = None,
              remat: bool = False) -> HRNet:
    return HRNet(width=width, num_joints=num_joints, depth_dim=depth_dim,
                 generate_hm=generate_hm, generate_feat=generate_feat,
                 dtype=dtype, name=name, remat=remat)
