"""Flax neural network modules (NHWC, bf16-friendly)."""

from horopose_tpu.models.resnet import ResNet, get_resnet  # noqa: F401
from horopose_tpu.models.hrnet import HRNet, get_hrnet  # noqa: F401
from horopose_tpu.models.depth_net import RootNet  # noqa: F401
from horopose_tpu.models.full_net import FullNet  # noqa: F401
