"""URDF parsing and compiled, batched, differentiable forward kinematics."""

from horopose_tpu.kinematics.urdf import URDFModel, parse_urdf  # noqa: F401
from horopose_tpu.kinematics.fk import KinematicPlan  # noqa: F401
from horopose_tpu.kinematics.robot import Robot  # noqa: F401
