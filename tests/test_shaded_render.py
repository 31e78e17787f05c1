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


def _write_textured_obj(d):
    """A unit quad facing +z with a left-red / right-blue texture."""
    from PIL import Image
    tex = np.zeros((8, 8, 3), np.uint8)
    tex[:, :4] = [255, 0, 0]
    tex[:, 4:] = [0, 0, 255]
    Image.fromarray(tex).save(d / "tex.png")
    (d / "quad.mtl").write_text(
        "newmtl painted\nKd 1.0 1.0 1.0\nmap_Kd tex.png\n")
    (d / "quad.obj").write_text(
        "mtllib quad.mtl\n"
        "v -0.5 -0.5 0\nv 0.5 -0.5 0\nv 0.5 0.5 0\nv -0.5 0.5 0\n"
        "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
        "usemtl painted\n"
        "f 1/1 2/2 3/3\nf 1/1 3/3 4/4\n")
    return d / "quad.obj"


def test_obj_texture_loading(tmp_path):
    from horopose_tpu.kinematics.meshes import load_obj_textured
    path = _write_textured_obj(tmp_path)
    v, f, face_uv, face_mat, mats = load_obj_textured(str(path))
    assert v.shape == (4, 3) and f.shape == (2, 3)
    assert face_uv.shape == (2, 3, 2)
    assert (face_mat == 0).all()
    assert mats[0]["map_kd"].endswith("tex.png")
    np.testing.assert_allclose(mats[0]["kd"], [1, 1, 1])


def test_textured_render_samples_texture(tmp_path):
    """The z-buffer renderer must sample map_Kd with correct orientation:
    a left-red/right-blue texture on a fronto-parallel quad must produce
    red pixels left of the principal point and blue right of it
    (reference analog: pyrender textured output, urdf_robot.py:277-388)."""
    from horopose_tpu.kinematics.meshes import load_obj_textured, _load_texture
    path = _write_textured_obj(tmp_path)
    v, f, face_uv, face_mat, mats = load_obj_textured(str(path))
    tex = _load_texture(mats[0]["map_kd"])
    verts = v + np.array([0, 0, 1.5], np.float32)
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    rgb, _ = render_shaded(verts, f, K, (64, 64),
                           face_uv=face_uv,
                           face_tex=np.zeros(len(f), np.int32),
                           textures=(tex,), ambient=1.0)
    left, right = rgb[32, 20], rgb[32, 44]
    assert left[0] > 150 and left[2] < 60, left      # red
    assert right[2] > 150 and right[0] < 60, right   # blue


def test_urdf_material_color_used(tmp_path):
    """URDF <visual><material><color rgba> drives the flat color."""
    from horopose_tpu.kinematics.urdf import parse_urdf
    from horopose_tpu.kinematics.meshes import build_robot_mesh
    urdf = """<robot name="r">
      <link name="base">
        <visual>
          <geometry><box size="0.4 0.4 0.4"/></geometry>
          <material name="m"><color rgba="0.0 1.0 0.0 1.0"/></material>
        </visual>
      </link>
    </robot>"""
    model = parse_urdf(urdf)
    mesh = build_robot_mesh(model, {"base": 0}, with_appearance=True)
    assert mesh.face_kd is not None
    np.testing.assert_allclose(mesh.face_kd, [[0, 1, 0]] * len(mesh.faces))


def test_robot_mesh_appearance_smoke():
    """with_appearance on the builtin (primitive) robots stays consistent
    and renders through render_robot_shaded."""
    robot = Robot("panda")
    link_index = {n: i for i, n in enumerate(robot.plan.link_names)}
    mesh = build_robot_mesh(robot.model, link_index, with_appearance=True)
    assert mesh.face_kd.shape == (len(mesh.faces), 3)
    assert mesh.face_uv.shape == (len(mesh.faces), 3, 2)
    assert mesh.face_tex.shape == (len(mesh.faces),)
    import jax.numpy as jnp
    from horopose_tpu.ops.rotations import rotmat_to_rot6d
    rot = rotmat_to_rot6d(jnp.eye(3)[None])[0]
    q = np.zeros(robot.dof, np.float32)
    K = np.array([[120.0, 0, 48], [0, 120.0, 36], [0, 0, 1]])
    rendered, _ = render_robot_shaded(robot, mesh, q, rot,
                                      np.array([0, 0.1, 1.2], np.float32),
                                      K, (72, 96))
    assert rendered.any()
