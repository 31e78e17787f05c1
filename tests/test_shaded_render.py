import numpy as np

from horopose_tpu.core.shaded_render import render_robot_shaded, render_shaded
from horopose_tpu.kinematics import Robot
from horopose_tpu.kinematics.meshes import box_mesh, build_robot_mesh


def test_shaded_box_depth_order():
    """Nearer triangle must win the z-buffer."""
    v1, f1 = box_mesh((0.4, 0.4, 0.01))
    near = v1 + np.array([0, 0, 1.0])
    far = v1 + np.array([0, 0, 2.0])
    verts = np.concatenate([near, far])
    faces = np.concatenate([f1, f1 + len(v1)])
    colors = np.concatenate([np.tile([[1, 0, 0]], (len(f1), 1)),
                             np.tile([[0, 0, 1]], (len(f1), 1))]).astype(
        np.float32)
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    rgb, depth = render_shaded(verts, faces, K, (64, 64),
                               face_colors=colors)
    # center pixel shows the near (red) box
    c = rgb[32, 32]
    assert c[0] > c[2], c
    assert abs(depth[32, 32] - 1.0) < 0.05


def test_robot_shaded_and_blend():
    robot = Robot("panda")
    mesh = build_robot_mesh(
        robot.model, {n: i for i, n in enumerate(robot.plan.link_names)})
    cfg = np.zeros(8, np.float32)
    rot = np.array([1, 0, 0, 0, 1, 0], np.float32)
    trans = np.array([0, 0, 1.5], np.float32)
    K = np.array([[120.0, 0, 40], [0, 120.0, 30], [0, 0, 1]])
    bg = np.full((60, 80, 3), 10, np.uint8)
    rendered, blended = render_robot_shaded(robot, mesh, cfg, rot, trans, K,
                                            (60, 80), root=0,
                                            original_image=bg)
    assert rendered.shape == (60, 80, 3)
    cover = rendered.any(-1).mean()
    assert 0.02 < cover < 0.9
    # blended keeps background where the robot is absent
    empty = ~rendered.any(-1)
    assert (blended[empty] == 10).all()
