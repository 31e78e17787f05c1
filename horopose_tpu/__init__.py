"""horopose_tpu — a TPU-native framework for holistic robot pose estimation.

From-scratch JAX / Flax / XLA / Pallas re-design with the capabilities of the
PyTorch reference `Oliverbansk/Holistic-Robot-Pose-Estimation` (ECCV 2024,
"Real-time Holistic Robot Pose Estimation with Unknown States").

Layer map (see SURVEY.md for the reference's structure this mirrors):

- :mod:`horopose_tpu.ops`        — batched geometry kernels (rotations, uvd<->xyz,
                                   soft-argmax integral, differentiable PnP,
                                   soft silhouette rasterizer). Pure jnp + Pallas.
- :mod:`horopose_tpu.kinematics` — URDF parsing -> static FK plan -> batched,
                                   differentiable forward kinematics.
- :mod:`horopose_tpu.models`     — Flax modules (ResNet, HRNet, DepthNet, full net,
                                   DeepLabV3 segmentation teacher).
- :mod:`horopose_tpu.data`       — DREAM-format dataset pipeline (CPU-side decode
                                   and augmentation, device-side normalize).
- :mod:`horopose_tpu.core`       — losses, jitted train/eval engine, metrics,
                                   checkpointing, config system.
- :mod:`horopose_tpu.parallel`   — jax.sharding mesh helpers (data-parallel pjit
                                   train steps; mesh shape is a config knob).
- :mod:`horopose_tpu.pipelines`  — train_depthnet / train_full / train_sim2real /
                                   test entry points mirroring the reference CLI.
"""

__version__ = "0.1.0"
