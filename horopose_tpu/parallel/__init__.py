"""Device-mesh / sharding helpers (jax.sharding + pjit)."""

from horopose_tpu.parallel.mesh import (make_mesh, shard_batch,  # noqa: F401
                                        replicate, data_sharding,
                                        image_sharding, shard_images,
                                        prefetch_to_device, train_mesh)
from horopose_tpu.parallel.multihost import (maybe_initialize,  # noqa: F401
                                             process_count, process_index,
                                             is_main_process,
                                             local_batch_size,
                                             DistributedSampler, to_host)
