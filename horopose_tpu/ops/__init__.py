"""Batched geometry / compute kernels (pure JAX + Pallas)."""

from horopose_tpu.ops import integral, rotations, transforms  # noqa: F401
from horopose_tpu.ops.pnp import pnp  # noqa: F401
from horopose_tpu.ops.rasterizer import (rasterize_silhouette,  # noqa: F401
                                         rasterize_silhouette_tiled,
                                         resolve_faces_per_tile)
