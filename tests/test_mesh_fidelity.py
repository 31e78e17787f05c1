"""Golden silhouette-fidelity test on a real multi-link OBJ mesh set.

Verdict-driven: the reference rasterizes actual per-link OBJ meshes
(/root/reference/lib/utils/mesh_renderer.py:94-140); this test drives that
exact path — OBJ files on disk, package:// URIs in a URDF, FK-posed links,
batched soft rasterization — and checks the rendered silhouette against an
ANALYTIC mask (convex hull of the projected box corners, computed by hand
from the URDF numbers, independent of kinematics/fk.py). Also covers the
fail-loud mesh provenance checks wired into sim2real.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from horopose_tpu.kinematics.fk import KinematicPlan
from horopose_tpu.kinematics.meshes import (box_mesh, build_robot_mesh,
                                            check_mesh_fidelity)
from horopose_tpu.kinematics.urdf import parse_urdf
from horopose_tpu.ops.rasterizer import rasterize_silhouette

BASE_SIZE = (0.3, 0.2, 0.15)
ARM_SIZE = (0.15, 0.1, 0.1)
JOINT_XYZ = (0.3, 0.0, 0.0)
VIS_XYZ = (0.1, 0.0, 0.0)


def _write_box_obj(path, size):
    v, f = box_mesh(size)
    with open(path, "w") as fh:
        for x, y, z in v:
            fh.write(f"v {x} {y} {z}\n")
        for a, b, c in f:
            fh.write(f"f {a + 1} {b + 1} {c + 1}\n")


def _toy_robot(tmp_path, arm_mesh="arm.obj"):
    meshes = tmp_path / "meshes"
    meshes.mkdir(exist_ok=True)
    _write_box_obj(meshes / "base.obj", BASE_SIZE)
    _write_box_obj(meshes / "arm.obj", ARM_SIZE)
    urdf = tmp_path / "toy.urdf"
    urdf.write_text(f"""
<robot name="toy">
  <link name="base"><visual>
    <geometry><mesh filename="package://toy/meshes/base.obj"/></geometry>
  </visual></link>
  <link name="arm"><visual>
    <origin xyz="{VIS_XYZ[0]} {VIS_XYZ[1]} {VIS_XYZ[2]}"/>
    <geometry><mesh filename="package://toy/meshes/{arm_mesh}"/></geometry>
  </visual></link>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="arm"/>
    <origin xyz="{JOINT_XYZ[0]} {JOINT_XYZ[1]} {JOINT_XYZ[2]}"/>
    <axis xyz="0 0 1"/><limit lower="-3.14" upper="3.14"/>
  </joint>
</robot>""")
    return str(urdf)


def _convex_hull(points):
    """Monotone-chain hull, CCW. points (N, 2) -> (M, 2)."""
    pts = sorted(map(tuple, points))

    def cross2(a, b):
        # scalar z-component; np.cross on 2-vectors is deprecated (numpy 2.0)
        return a[0] * b[1] - a[1] * b[0]

    def half(seq):
        out = []
        for p in seq:
            while len(out) >= 2 and cross2(
                    np.subtract(out[-1], out[-2]),
                    np.subtract(p, out[-2])) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(reversed(pts))
    return np.asarray(lower[:-1] + upper[:-1], np.float64)


def _fill_convex(hull, H, W):
    """Rasterize a CCW convex polygon analytically (pixel centers)."""
    ys, xs = np.mgrid[0:H, 0:W]
    # sample at pixel CENTERS, matching rasterize_silhouette's +0.5 grid
    p = np.stack([xs + 0.5, ys + 0.5], axis=-1).astype(np.float64)
    inside = np.ones((H, W), bool)
    n = len(hull)
    for i in range(n):
        a, b = hull[i], hull[(i + 1) % n]
        cross = (b[0] - a[0]) * (p[..., 1] - a[1]) - \
                (b[1] - a[1]) * (p[..., 0] - a[0])
        inside &= cross >= 0
    return inside


def _project(K, pts_cam):
    uv = pts_cam[:, :2] / pts_cam[:, 2:3]
    return uv * np.array([K[0, 0], K[1, 1]]) + np.array([K[0, 2], K[1, 2]])


def _rotz(q):
    c, s = np.cos(q), np.sin(q)
    T = np.eye(4)
    T[:2, :2] = [[c, -s], [s, c]]
    return T


def _trans(x, y, z):
    T = np.eye(4)
    T[:3, 3] = [x, y, z]
    return T


def _box_corners(size):
    sx, sy, sz = [s / 2 for s in size]
    return np.array([[x, y, z] for x in (-sx, sx) for y in (-sy, sy)
                     for z in (-sz, sz)])


def _analytic_mask(q, base2cam, K, H, W):
    """Union of the two boxes' silhouettes, each the filled convex hull of
    its 8 projected corners — hand-built transforms, no FK code."""
    base_world = base2cam                                   # visual at origin
    arm_world = base2cam @ _trans(*JOINT_XYZ) @ _rotz(q) @ _trans(*VIS_XYZ)
    mask = np.zeros((H, W), bool)
    for T, size in ((base_world, BASE_SIZE), (arm_world, ARM_SIZE)):
        corners = _box_corners(size) @ T[:3, :3].T + T[:3, 3]
        uv = _project(K, corners)
        mask |= _fill_convex(_convex_hull(uv), H, W)
    return mask


@pytest.mark.parametrize("q", [0.0, np.pi / 2, -0.7])
def test_obj_robot_silhouette_matches_analytic(tmp_path, q):
    urdf = _toy_robot(tmp_path)
    model = parse_urdf(urdf)
    plan = KinematicPlan(model)
    link_index = {n: i for i, n in enumerate(plan.link_names)}
    rm = build_robot_mesh(model, link_index)
    assert rm.n_file_geoms == 2 and rm.n_primitive_geoms == 0
    assert not rm.missing_meshes and not rm.unsupported_meshes
    check_mesh_fidelity(rm)  # must not raise

    H = W = 96
    K = np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]])
    base2cam = _trans(-0.15, 0.0, 1.2)

    link_poses = np.asarray(plan.link_poses(jnp.asarray([q])[None]))[0]
    world = base2cam[None] @ link_poses                    # (L, 4, 4)
    Rv = world[rm.vert_link, :3, :3]
    tv = world[rm.vert_link, :3, 3]
    v_cam = np.einsum("vij,vj->vi", Rv, rm.verts) + tv
    # sigma small -> near-hard edges; the soft sigmoid at training sigma=1.0
    # blurs ~1px around the boundary, which is signal, not geometry error
    rendered = np.asarray(rasterize_silhouette(
        jnp.asarray(v_cam)[None], rm.faces, jnp.asarray(K)[None],
        (H, W), sigma=0.02))[0]

    analytic = _analytic_mask(q, base2cam, K, H, W)
    hard = rendered > 0.5
    inter = np.sum(hard & analytic)
    union = np.sum(hard | analytic)
    iou = inter / union
    assert iou >= 0.98, f"silhouette IoU {iou:.3f} < 0.98 at q={q}"


def test_missing_mesh_fails_loudly(tmp_path):
    urdf = _toy_robot(tmp_path, arm_mesh="nonexistent.obj")
    model = parse_urdf(urdf)
    plan = KinematicPlan(model)
    rm = build_robot_mesh(model,
                          {n: i for i, n in enumerate(plan.link_names)})
    assert rm.missing_meshes
    with pytest.raises(RuntimeError, match="missing mesh files"):
        check_mesh_fidelity(rm)


def test_unsupported_mesh_format_fails_loudly(tmp_path):
    (tmp_path / "meshes").mkdir(exist_ok=True)
    (tmp_path / "meshes" / "arm.stl").write_bytes(b"\x00" * 84)
    urdf = _toy_robot(tmp_path, arm_mesh="arm.stl")
    model = parse_urdf(urdf)
    plan = KinematicPlan(model)
    rm = build_robot_mesh(model,
                          {n: i for i, n in enumerate(plan.link_names)})
    assert rm.unsupported_meshes
    with pytest.raises(RuntimeError, match="non-OBJ"):
        check_mesh_fidelity(rm)
