"""Batched geometry / compute kernels (pure JAX + Pallas)."""

from horopose_tpu.ops import rotations, transforms  # noqa: F401
