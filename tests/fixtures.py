"""Fabricate a tiny DREAM-format dataset directory for tests.

The DREAM on-disk schema (jpg + per-image json + _camera_settings.json) is
documented by the reference reader (/root/reference/lib/dataset/dream.py:
108-224). Geometry is generated self-consistently: a random base pose is
encoded as quaternion_xyzw exactly the way the reader decodes it, and the 3D
keypoints come from the real FK of the built-in robot description, so
FK(gt_joints) placed at TCO reproduces the annotated keypoints.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
from PIL import Image

from horopose_tpu import constants as C
from horopose_tpu.data.dream import R_NORMAL_UE, _quat_xyzw_to_rotmat
from horopose_tpu.kinematics import Robot

import jax.numpy as jnp


def make_synthetic_dream_dataset(base_dir, robot_type="panda", n_images=6,
                                 seed=0, image_hw=(480, 640),
                                 synthetic=True, split="test_dr") -> Path:
    """Write n_images DREAM-format samples under base_dir.

    Directory name matters to the reader: include 'synthetic' for the 0.01
    translation scale and the robot name for keypoint table selection.
    """
    rng = np.random.RandomState(seed)
    base = Path(base_dir)
    name = f"{robot_type}_synth_{split}" if synthetic else \
        f"{robot_type}-3cam_{split}"
    root = base / ("synthetic" if synthetic else "real") / name
    root.mkdir(parents=True, exist_ok=True)
    h, w = image_hw
    fx = fy = 320.0
    cx, cy = w / 2, h / 2
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
    scale = 0.01 if synthetic else 1.0

    (root / "_camera_settings.json").write_text(json.dumps({
        "camera_settings": [{
            "name": "camera",
            "intrinsic_settings": {"fx": fx, "fy": fy, "cx": cx, "cy": cy},
        }]
    }))

    robot = Robot(robot_type)
    bounds = C.JOINT_BOUNDS[robot_type]
    kp_names = C.KEYPOINT_NAMES[robot_type]
    joint_names = C.JOINT_NAMES[robot_type]

    for i in range(n_images):
        # random base pose: decode path defines the rotation; keep the robot
        # in front of the camera
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        R = _quat_xyzw_to_rotmat(q) @ R_NORMAL_UE
        trans = np.array([rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2),
                          rng.uniform(1.2, 2.2)])
        TCO = np.eye(4)
        TCO[:3, :3] = R
        TCO[:3, 3] = trans

        cfg = rng.uniform(bounds[:, 0] * 0.5, bounds[:, 1] * 0.5)
        kp_base = np.asarray(robot.get_keypoints_only_fk(
            jnp.asarray(cfg, jnp.float32)[None]))[0].astype(np.float64)
        kp_cam = (R @ kp_base.T).T + trans
        proj = (K @ kp_cam.T).T
        kp2d = proj[:, :2] / proj[:, 2:3]

        margin = 10
        bb_min = kp2d.min(axis=0) - margin
        bb_max = kp2d.max(axis=0) + margin

        ann = {
            "objects": [{
                "class": robot_type,
                "quaternion_xyzw": q.tolist(),
                "location": (trans / scale).tolist(),
                "bounding_box": {"min": bb_min.tolist(),
                                 "max": bb_max.tolist()},
                "keypoints": [
                    {"name": kp_names[k],
                     "location": (kp_cam[k] / scale).tolist(),
                     "projected_location": kp2d[k].tolist()}
                    for k in range(len(kp_names))
                ],
            }],
            "sim_state": {
                "joints": [{"name": f"{robot_type}/{jn}",
                            "position": float(cfg[j])}
                           for j, jn in enumerate(joint_names)],
            },
        }
        img = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(root / f"{i:06d}.jpg", quality=85)
        (root / f"{i:06d}.json").write_text(json.dumps(ann))
    return root
