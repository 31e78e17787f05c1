"""Device-mesh / sharding helpers (jax.sharding + pjit)."""

from horopose_tpu.parallel.mesh import (make_mesh, shard_batch,  # noqa: F401
                                        replicate, data_sharding,
                                        image_sharding, shard_images)
