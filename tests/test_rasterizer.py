"""Rasterizer: analytic silhouettes, IoU checks, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np

from horopose_tpu.kinematics import Robot
from horopose_tpu.kinematics.meshes import (box_mesh, build_robot_mesh,
                                            sphere_mesh)
from horopose_tpu.ops.rasterizer import (rasterize_silhouette,
                                         render_robot_silhouette)


def simple_K(f=100.0, cx=32.0, cy=32.0):
    return jnp.asarray([[f, 0, cx], [0, f, cy], [0, 0, 1]], jnp.float32)


def test_square_silhouette_area():
    """A fronto-parallel unit square at z=2, f=100 -> 50x50 px footprint."""
    v, f = box_mesh((1.0, 1.0, 0.01))
    verts = jnp.asarray(v)[None] + jnp.asarray([0, 0, 2.0])
    alpha = rasterize_silhouette(verts, f, simple_K(), (64, 64), sigma=0.05)
    a = np.asarray(alpha)[0]
    # expected: 50 x 50 = 2500 px inside (small sigma -> sharp edges)
    area = (a > 0.5).sum()
    assert abs(area - 2500) < 2500 * 0.05, area
    # center on, corner off
    assert a[32, 32] > 0.9
    assert a[2, 2] < 0.1


def test_sphere_silhouette_circle():
    v, f = sphere_mesh(0.3, n=16)
    verts = jnp.asarray(v)[None] + jnp.asarray([0, 0, 2.0])
    alpha = rasterize_silhouette(verts, f, simple_K(), (64, 64), sigma=0.05)
    a = np.asarray(alpha)[0]
    r_px = 0.3 / 2.0 * 100
    area = (a > 0.5).sum()
    assert abs(area - np.pi * r_px ** 2) < np.pi * r_px ** 2 * 0.12


def test_behind_camera_culled():
    v, f = box_mesh((1.0, 1.0, 0.01))
    verts = jnp.asarray(v)[None] + jnp.asarray([0, 0, -2.0])
    alpha = rasterize_silhouette(verts, f, simple_K(), (32, 32), sigma=0.25)
    assert float(jnp.max(alpha)) < 1e-3


def test_gradient_moves_silhouette():
    """d(mask MSE)/d(translation) must push the object toward the target."""
    v, f = box_mesh((0.5, 0.5, 0.01))
    target_v = jnp.asarray(v)[None] + jnp.asarray([0.2, 0.0, 2.0])
    target = rasterize_silhouette(target_v, f, simple_K(), (64, 64),
                                  sigma=1.0)

    def loss(dx):
        verts = jnp.asarray(v)[None] + jnp.asarray([dx, 0.0, 2.0])
        alpha = rasterize_silhouette(verts, f, simple_K(), (64, 64),
                                     sigma=1.0)
        return jnp.mean((alpha - target) ** 2)

    g = jax.grad(loss)(0.0)
    assert np.isfinite(float(g))
    # at dx=0 the object sits left of the target -> gradient negative
    # (moving +x reduces loss)
    assert float(g) < 0


def test_robot_silhouette_renders():
    robot = Robot("panda")
    mesh = build_robot_mesh(
        robot.model, {n: i for i, n in enumerate(robot.plan.link_names)})
    assert mesh.num_faces > 100
    B = 2
    cfg = jnp.zeros((B, 8))
    rot = jnp.asarray([[1, 0, 0, 0, 1, 0]] * B, jnp.float32)
    trans = jnp.asarray([[0, 0, 1.5]] * B, jnp.float32)
    K = jnp.asarray([[120.0, 0, 40], [0, 120.0, 30], [0, 0, 1]])
    alpha = render_robot_silhouette(robot, mesh, cfg, rot, trans, K,
                                    (60, 80), root=0, sigma=1.0)
    a = np.asarray(alpha)
    assert a.shape == (B, 60, 80)
    cover = (a[0] > 0.5).mean()
    assert 0.02 < cover < 0.9, cover


def test_robot_silhouette_root_reframe_consistency():
    """Rendering with a root-frame pose must match rendering with the
    equivalent base-frame pose."""
    from horopose_tpu.ops.rotations import (make_T, rot6d_to_rotmat,
                                            rotmat_to_rot6d)
    robot = Robot("panda")
    mesh = build_robot_mesh(
        robot.model, {n: i for i, n in enumerate(robot.plan.link_names)})
    cfg = jnp.full((1, 8), 0.2)
    rot = jnp.asarray([[1, 0, 0, 0, 1, 0]], jnp.float32)
    trans = jnp.asarray([[0, 0, 1.5]], jnp.float32)
    base = render_robot_silhouette(robot, mesh, cfg, rot, trans,
                                   simple_K(120.0, 40, 30), (60, 80),
                                   root=0, sigma=1.0)
    TWL = robot.get_TWL(cfg)
    root = 3
    base2cam = make_T(rot6d_to_rotmat(rot), trans)
    root_pose = base2cam @ TWL[:, root]
    rot_r = rotmat_to_rot6d(root_pose[:, :3, :3])
    trans_r = root_pose[:, :3, 3]
    reframed = render_robot_silhouette(robot, mesh, cfg, rot_r, trans_r,
                                       simple_K(120.0, 40, 30), (60, 80),
                                       root=root, sigma=1.0)
    np.testing.assert_allclose(np.asarray(reframed), np.asarray(base),
                               atol=1e-3)
