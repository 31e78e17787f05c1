"""DREAM-format data pipeline (CPU decode/augment, device normalize)."""

from horopose_tpu.data.dream import DreamDataset, build_frame_index  # noqa: F401
from horopose_tpu.data.samplers import DataLoader, PartialSampler, ListSampler  # noqa: F401
