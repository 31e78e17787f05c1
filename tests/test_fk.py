"""FK correctness: numpy oracle, limb-length table, root reframing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from horopose_tpu import constants as C
from horopose_tpu.kinematics import Robot, parse_urdf
from horopose_tpu.kinematics.fk import KinematicPlan


def numpy_fk_oracle(model, actuated, cfg):
    """Straightforward recursive FK in numpy for verification."""
    qmap = dict(zip(actuated, cfg))

    def joint_T(j):
        q = 0.0
        if j.mimic_joint is not None:
            src = model.joints[j.mimic_joint]
            q = j.mimic_multiplier * qmap.get(src.name, 0.0) + j.mimic_offset
        else:
            q = qmap.get(j.name, 0.0)
        T = np.eye(4)
        if j.jtype in ("revolute", "continuous"):
            a = j.axis
            K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
            T[:3, :3] = np.eye(3) + np.sin(q) * K + (1 - np.cos(q)) * K @ K
        elif j.jtype == "prismatic":
            T[:3, 3] = j.axis * q
        return j.origin @ T

    poses = {model.root_link: np.eye(4)}
    pending = list(model.joints.values())
    while pending:
        progressed = False
        for j in list(pending):
            if j.parent in poses:
                poses[j.child] = poses[j.parent] @ joint_T(j)
                pending.remove(j)
                progressed = True
        assert progressed, "disconnected URDF"
    return poses


@pytest.mark.parametrize("robot_type", ["panda", "kuka", "baxter"])
def test_fk_matches_numpy_oracle(robot_type, rng):
    robot = Robot(robot_type)
    bounds = C.JOINT_BOUNDS[robot_type]
    cfg = rng.uniform(bounds[:, 0], bounds[:, 1]).astype(np.float32)
    poses = np.asarray(robot.plan.link_poses(jnp.asarray(cfg)[None]))[0]
    oracle = numpy_fk_oracle(robot.model, C.JOINT_NAMES[robot_type], cfg)
    for i, name in enumerate(robot.plan.link_names):
        np.testing.assert_allclose(poses[i], oracle[name], atol=1e-5,
                                   err_msg=f"link {name}")


@pytest.mark.parametrize("robot_type,expected", [
    ("panda", C.LIMB_LENGTH["panda"]),
    ("kuka", C.LIMB_LENGTH["kuka"]),
])
def test_limb_lengths_match_dream_tables(robot_type, expected, rng):
    """Distances between consecutive keypoints must match the benchmark's
    published limb-length table at ANY joint configuration."""
    robot = Robot(robot_type)
    bounds = C.JOINT_BOUNDS[robot_type]
    cfg = rng.uniform(bounds[:, 0], bounds[:, 1], (4, robot.dof)).astype(np.float32)
    kps = np.asarray(robot.get_keypoints_only_fk(jnp.asarray(cfg)))
    lengths = np.linalg.norm(kps[:, 1:] - kps[:, :-1], axis=-1)
    for b in range(4):
        np.testing.assert_allclose(lengths[b], expected, atol=2e-4)


def test_keypoints_shapes():
    robot = Robot("baxter")
    cfg = jnp.zeros((3, 15))
    kps = robot.get_keypoints_only_fk(cfg)
    assert kps.shape == (3, 17, 3)


def test_root_reframe_consistency(rng):
    """Composing root2cam with FK-at-root must equal base2cam with FK-at-base
    when root2cam is derived from the same base pose."""
    robot = Robot("panda")
    cfg = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 8)).astype(np.float32))
    rot = jnp.asarray(rng.randn(2, 6).astype(np.float32))
    trans = jnp.asarray(rng.uniform(-0.2, 0.2, (2, 3)).astype(np.float32) +
                        np.array([0, 0, 1.5], np.float32))
    root = 3
    # camera-frame keypoints via base placement
    kp_base = robot.get_keypoints(cfg, rot, trans)
    # derive the root pose in camera frame, then use get_keypoints_root
    from horopose_tpu.ops.rotations import make_T, rot_to_rotmat, rotmat_to_rot6d
    TWL = robot.get_TWL(cfg)
    base2cam = make_T(rot_to_rotmat(rot), trans)
    root_pose_cam = base2cam @ TWL[:, root]
    rot_root = rotmat_to_rot6d(root_pose_cam[:, :3, :3])
    trans_root = root_pose_cam[:, :3, 3]
    kp_root = robot.get_keypoints_root(cfg, rot_root, trans_root, root=root)
    np.testing.assert_allclose(np.asarray(kp_root), np.asarray(kp_base),
                               atol=1e-4)


def test_rotation_at_specific_root(rng):
    robot = Robot("panda")
    cfg = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 8)).astype(np.float32))
    rot = jnp.asarray(rng.randn(2, 6).astype(np.float32))
    trans = jnp.zeros((2, 3))
    out = robot.get_rotation_at_specific_root(cfg, rot, trans, root=3)
    assert out.shape == (2, 6)
    # root=0 passthrough
    out0 = robot.get_rotation_at_specific_root(cfg, rot, trans, root=0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(rot))


def test_fk_is_differentiable_and_jittable(rng):
    robot = Robot("panda")

    @jax.jit
    def loss(cfg):
        kps = robot.get_keypoints_only_fk(cfg)
        return jnp.sum(kps ** 2)

    cfg = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 8)).astype(np.float32))
    g = jax.grad(loss)(cfg)
    assert g.shape == cfg.shape
    assert np.isfinite(np.asarray(g)).all()
    # finite-difference check on one coordinate
    eps = 1e-3
    cfg_np = np.asarray(cfg)
    for j in [0, 3]:
        d = np.zeros_like(cfg_np)
        d[0, j] = eps
        fd = (loss(jnp.asarray(cfg_np + d)) - loss(jnp.asarray(cfg_np - d))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g)[0, j], float(fd), rtol=2e-2,
                                   atol=1e-3)


def test_prismatic_and_mimic_joints():
    """Panda finger joints: prismatic + mimic must both move."""
    robot = Robot("panda")
    plan = robot.plan
    cfg0 = jnp.zeros((1, 8))
    cfg1 = jnp.zeros((1, 8)).at[0, 7].set(0.04)
    li = plan.link_names.index("panda_leftfinger")
    ri = plan.link_names.index("panda_rightfinger")
    p0 = np.asarray(plan.link_poses(cfg0))[0]
    p1 = np.asarray(plan.link_poses(cfg1))[0]
    dl = np.linalg.norm(p1[li, :3, 3] - p0[li, :3, 3])
    dr = np.linalg.norm(p1[ri, :3, 3] - p0[ri, :3, 3])
    np.testing.assert_allclose(dl, 0.04, atol=1e-6)
    np.testing.assert_allclose(dr, 0.04, atol=1e-6)
    # fingers move in opposite directions
    np.testing.assert_allclose(p1[li, :3, 3] - p0[li, :3, 3],
                               -(p1[ri, :3, 3] - p0[ri, :3, 3]), atol=1e-6)


def test_baxter_keypoint_offsets_nonzero():
    robot = Robot("baxter")
    offs = np.asarray(robot._kp_offsets)
    assert offs.shape == (17, 3)
    # shoulder keypoints carry the arm-mount offset chain; hands are nonzero
    assert np.abs(offs).sum() > 0.1


def test_parse_urdf_from_string():
    urdf = """
    <robot name="mini">
      <link name="a"/><link name="b"/>
      <joint name="j1" type="revolute">
        <parent link="a"/><child link="b"/>
        <origin xyz="0 0 1" rpy="0 0 0"/><axis xyz="0 1 0"/>
        <limit lower="-1" upper="1"/>
      </joint>
    </robot>"""
    model = parse_urdf(urdf)
    assert model.root_link == "a"
    plan = KinematicPlan(model, ["j1"])
    poses = np.asarray(plan.link_poses(jnp.asarray([[0.5]])))[0]
    assert poses.shape == (2, 4, 4)
    # rotation about y by 0.5
    np.testing.assert_allclose(poses[1, 0, 0], np.cos(0.5), atol=1e-6)


def test_unknown_robot_friendly_error():
    with pytest.raises(ValueError, match="unknown robot type"):
        Robot("ur5")
    with pytest.raises(ValueError, match="no built-in description"):
        Robot("owi535")


def test_urdf_mesh_scale_and_package_uri(tmp_path):
    """URDF mesh scale attribute and package:// resolution."""
    import numpy as np
    from horopose_tpu.kinematics.meshes import geometry_mesh
    obj = tmp_path / "meshes" / "part.obj"
    obj.parent.mkdir()
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    urdf = f"""
    <robot name="m">
      <link name="a">
        <visual>
          <origin xyz="0 0 1" rpy="0 0 0"/>
          <geometry><mesh filename="package://pkg/meshes/part.obj"
                          scale="2 2 2"/></geometry>
        </visual>
      </link>
    </robot>"""
    model = parse_urdf(urdf, base_dir=str(tmp_path))
    g = model.links["a"].visuals[0]
    v, f = geometry_mesh(g)
    assert f.shape == (1, 3)
    # scaled by 2 and offset by origin z=1
    np.testing.assert_allclose(v[1], [2, 0, 1], atol=1e-6)
