"""ResNet trunk in Flax (NHWC).

Parity target: /root/reference/lib/models/backbones/Resnet.py:5-194 — a
torchvision-style ResNet-18/34/50/101/152 without the avgpool/fc head,
output stride 32, returning the final feature map.

TPU-native choices: NHWC layout (XLA's native conv layout on TPU), optional
bfloat16 compute with f32 BatchNorm statistics, and a `dtype` knob threaded
through every layer.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

from horopose_tpu.models.common import batch_norm

ModuleDef = Any

RESNET_SPECS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
    # reference alias: "resnet" == resnet50 (Resnet.py:183-194)
    "resnet": ("bottleneck", (3, 4, 6, 3)),
}


class BasicBlock(nn.Module):
    filters: int
    strides: int = 1
    dtype: Any = jnp.float32
    expansion: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda: batch_norm(train, dtype=self.dtype)
        residual = x
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False, dtype=self.dtype)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype)(y)
        y = norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1),
                               (self.strides, self.strides), use_bias=False,
                               dtype=self.dtype)(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    filters: int
    strides: int = 1
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True):
        norm = lambda: batch_norm(train, dtype=self.dtype)
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides),
                    padding=1, use_bias=False, dtype=self.dtype)(y)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)
        y = norm()(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters * 4, (1, 1),
                               (self.strides, self.strides), use_bias=False,
                               dtype=self.dtype)(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Trunk only: input (B, H, W, 3) -> feature map (B, H/32, W/32, C)."""
    block: str = "bottleneck"           # "basic" | "bottleneck"
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.float32
    # per-block jax.checkpoint: backward recomputes each block's internals
    # instead of storing them — trades ~30% extra forward FLOPs for the
    # activation memory that caps the training batch (cfg.remat knob)
    remat: bool = False

    @property
    def expansion(self) -> int:
        return 4 if self.block == "bottleneck" else 1

    @property
    def feature_channels(self) -> int:
        return 512 * self.expansion

    @nn.compact
    def __call__(self, x, train: bool = True):
        block_cls: Callable = Bottleneck if self.block == "bottleneck" else BasicBlock
        if self.remat:  # train must then be passed positionally (static arg)
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = batch_norm(train, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, num_blocks in enumerate(self.stage_sizes):
            for i in range(num_blocks):
                strides = 2 if stage > 0 and i == 0 else 1
                x = block_cls(filters=64 * 2 ** stage, strides=strides,
                              dtype=self.dtype,
                              name=f"layer{stage + 1}_{i}")(x, train)
        return x


def get_resnet(arch: str, dtype=jnp.float32, name: str = None,
               remat: bool = False) -> ResNet:
    block, sizes = RESNET_SPECS[arch]
    return ResNet(block=block, stage_sizes=sizes, dtype=dtype, name=name,
                  remat=remat)
