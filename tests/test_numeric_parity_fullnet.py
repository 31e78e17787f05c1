"""NUMERIC torch<->flax parity for the FLAGSHIP FullNet (RootNetwithRegInt,
resnet50 reg + hrnet32 rootnet) using the reference's own torch module
(/root/reference/lib/models/full_net.py:239-397) with fully randomized
weights AND BatchNorm stats, converted via
tools/torch_weights.convert_fullnet_reference_checkpoint. All eight forward
outputs must agree in f32 (VERDICT r2 'do this' #1).

FK note: the reference's URDFRobot is bridged to OUR compiled-plan FK
(ref_torch.BridgeURDFRobot) because urdfpytorch's deps (trimesh + the URDF
files) are absent here; the xyz_fk comparison therefore proves the FK
INPUTS (pose/rot/trans) agree — the FK itself is validated against a numpy
oracle in test_fk.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_torch import (EasyDict, randomize_state_dict, rel_err,
                       setup_reference_imports, to_numpy_sd)

# The reference hardcodes depth_dim=64 (full_net.py:64) and its integral
# layer requires height_dim == depth_dim (integral.py:122 broadcasts the
# same range tensor over W/H/D) — so parity must run at the true flagship
# geometry, 256x256.
IMG = 256


def make_ref_args(**over):
    # flagship flags: configs/panda/full.yaml + lib/core/config.py defaults
    base = dict(
        backbone_name="resnet50", rootnet_backbone_name="hrnet32",
        use_rpmg=False, n_iter=4, other_image_size=IMG,
        bbox_3d_shape=[1300, 1300, 1300], reference_keypoint_id=3,
        fix_root=True, rotation_dim=6, p_dropout=0.5, reg_joint_map=False,
        joint_conv_dim=[], direct_reg_rot=False, rot_iterative_matmul=False,
        multi_kp=False, kps_need_depth=None, add_fc=False)
    base.update(over)
    return EasyDict(base)


@pytest.fixture(scope="module")
def ref_full_net():
    setup_reference_imports()
    import models.backbones.HRnet as ref_hrnet
    import models.backbones.Resnet as ref_resnet
    import models.full_net as ref_full
    # pretrained init needs torchvision/model-zoo downloads (absent);
    # weights are fully randomized right after construction anyway
    ref_resnet.ResNet.init_weights = lambda self, name: None
    ref_hrnet.PoseHighResolutionNet.init_weights = \
        lambda self, pretrained="": None
    return ref_full


def _build_ref_flagship(ref_full, args):
    from dataset.const import INITIAL_JOINT_ANGLE
    init_param_dict = {
        "robot_type": "panda",
        "pose_params": INITIAL_JOINT_ANGLE,
        "cam_params": np.eye(4, dtype=float),
        "init_pose_from_mean": True,
    }
    import os
    cwd = os.getcwd()
    os.chdir("/root/reference")
    try:
        return ref_full.RootNetwithRegInt(init_param_dict, args)
    finally:
        os.chdir(cwd)


def _our_fullnet(cfg_over=None):
    from horopose_tpu.config import make_default_cfg
    from horopose_tpu.pipelines.common import build_fullnet
    cfg = make_default_cfg()
    cfg.urdf_robot_name = "panda"
    cfg.image_size = float(IMG)
    cfg.backbone_name = "resnet50"
    cfg.rootnet_backbone_name = "hrnet32"
    cfg.reference_keypoint_id = 3
    for k, v in (cfg_over or {}).items():
        cfg[k] = v
    return build_fullnet(cfg)


def test_fullnet_flagship_numeric_forward_parity(ref_full_net, rng):
    import torch
    from horopose_tpu.kinematics import Robot
    from horopose_tpu.tools.torch_weights import (
        convert_fullnet_reference_checkpoint, merge_into)

    args = make_ref_args()
    tmodel = _build_ref_flagship(ref_full_net, args)
    tmodel.load_state_dict(randomize_state_dict(tmodel.state_dict(), rng))
    tmodel.eval()

    B = 2
    x_reg = rng.rand(B, IMG, IMG, 3).astype(np.float32)
    x_root = rng.rand(B, IMG, IMG, 3).astype(np.float32)
    k_value = (rng.rand(B) * 1000 + 800).astype(np.float32)
    K = np.broadcast_to(np.array([[320.0, 0, IMG / 2], [0, 320.0, IMG / 2],
                                  [0, 0, 1]], np.float32), (B, 3, 3)).copy()
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x_reg.transpose(0, 3, 1, 2)),
                       torch.from_numpy(x_root.transpose(0, 3, 1, 2)),
                       torch.from_numpy(k_value), torch.from_numpy(K))
    t_pose, t_rot, t_trans, t_root_uv, t_depth, t_uvd, t_xyz_int, t_xyz_fk = \
        [t.numpy() for t in t_out]

    fmodel = _our_fullnet()
    key = jax.random.PRNGKey(0)
    variables = fmodel.init({"params": key, "dropout": key},
                            jnp.zeros((1, IMG, IMG, 3)),
                            jnp.zeros((1, IMG, IMG, 3)), jnp.ones((1,)),
                            jnp.eye(3)[None], train=False)
    tb = convert_fullnet_reference_checkpoint(to_numpy_sd(tmodel),
                                              "resnet50", "hrnet32")
    variables = merge_into(variables, tb)
    out = jax.jit(lambda v, a, b, k, K: fmodel.apply(v, a, b, k, K,
                                                     train=False))(
        variables, jnp.asarray(x_reg), jnp.asarray(x_root),
        jnp.asarray(k_value), jnp.asarray(K))
    robot = Robot("panda")
    f_xyz_fk = robot.get_keypoints_root(out["pose"], out["rot"], out["trans"],
                                        root=3)

    for name, ours, theirs in [
            ("depth", out["depth"], t_depth),
            ("uvd", out["uvd"], t_uvd),
            ("xyz_int", out["xyz_int"], t_xyz_int),
            ("root_uv", out["root_uv"], t_root_uv),
            ("trans", out["trans"], t_trans),
            ("pose", out["pose"], t_pose),
            ("rot", out["rot"], t_rot),
            ("xyz_fk", f_xyz_fk, t_xyz_fk)]:
        err = rel_err(ours, theirs)
        assert err < 2e-4, f"{name}: rel err {err}"


def test_fullnet_multikp_addfc_numeric_parity(ref_full_net, rng):
    """Variant heads: multi_kp depth head + add_fc bottleneck + resnet
    rootnet — the non-default branches of the depth pathway."""
    import torch
    from horopose_tpu.tools.torch_weights import (
        convert_fullnet_reference_checkpoint, merge_into)

    args = make_ref_args(rootnet_backbone_name="resnet34", multi_kp=True,
                         kps_need_depth=[0, 2, 3], add_fc=True)
    tmodel = _build_ref_flagship(ref_full_net, args)
    tmodel.load_state_dict(randomize_state_dict(tmodel.state_dict(), rng))
    tmodel.eval()

    B = 2
    x_reg = rng.rand(B, IMG, IMG, 3).astype(np.float32)
    x_root = rng.rand(B, IMG, IMG, 3).astype(np.float32)
    k_value = (rng.rand(B) * 1000 + 800).astype(np.float32)
    K = np.broadcast_to(np.array([[320.0, 0, IMG / 2], [0, 320.0, IMG / 2],
                                  [0, 0, 1]], np.float32), (B, 3, 3)).copy()
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x_reg.transpose(0, 3, 1, 2)),
                       torch.from_numpy(x_root.transpose(0, 3, 1, 2)),
                       torch.from_numpy(k_value), torch.from_numpy(K))
    # multi_kp returns 9 tensors (pred_depths inserted at index 5)
    t_pose, t_rot, t_trans, t_root_uv, t_depth, t_depths = \
        [t.numpy() for t in t_out[:6]]

    fmodel = _our_fullnet(dict(rootnet_backbone_name="resnet34",
                               multi_kp=True, kps_need_depth=[0, 2, 3],
                               add_fc=True))
    key = jax.random.PRNGKey(0)
    variables = fmodel.init({"params": key, "dropout": key},
                            jnp.zeros((1, IMG, IMG, 3)),
                            jnp.zeros((1, IMG, IMG, 3)), jnp.ones((1,)),
                            jnp.eye(3)[None], train=False)
    tb = convert_fullnet_reference_checkpoint(to_numpy_sd(tmodel),
                                              "resnet50", "resnet34")
    variables = merge_into(variables, tb)
    out = fmodel.apply(variables, jnp.asarray(x_reg), jnp.asarray(x_root),
                       jnp.asarray(k_value), jnp.asarray(K), train=False)
    assert rel_err(out["depths"], t_depths) < 2e-4
    assert rel_err(out["depth"], t_depth) < 2e-4
    assert rel_err(out["pose"], t_pose) < 2e-4
    assert rel_err(out["rot"], t_rot) < 2e-4


def _parity_inputs(rng, B=2):
    x_reg = rng.rand(B, IMG, IMG, 3).astype(np.float32)
    x_root = rng.rand(B, IMG, IMG, 3).astype(np.float32)
    k_value = (rng.rand(B) * 1000 + 800).astype(np.float32)
    K = np.broadcast_to(np.array([[320.0, 0, IMG / 2], [0, 320.0, IMG / 2],
                                  [0, 0, 1]], np.float32), (B, 3, 3)).copy()
    return x_reg, x_root, k_value, K


def _run_both(ref_full_net, rng, args_over, cfg_over, n_outputs=8):
    import torch
    from horopose_tpu.tools.torch_weights import (
        convert_fullnet_reference_checkpoint, merge_into)
    args = make_ref_args(**args_over)
    tmodel = _build_ref_flagship(ref_full_net, args)
    tmodel.load_state_dict(randomize_state_dict(tmodel.state_dict(), rng))
    tmodel.eval()
    x_reg, x_root, k_value, K = _parity_inputs(rng)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x_reg.transpose(0, 3, 1, 2)),
                       torch.from_numpy(x_root.transpose(0, 3, 1, 2)),
                       torch.from_numpy(k_value), torch.from_numpy(K))
    t_out = [t.numpy() for t in t_out[:n_outputs]]
    fmodel = _our_fullnet(cfg_over)
    key = jax.random.PRNGKey(0)
    variables = fmodel.init({"params": key, "dropout": key},
                            jnp.zeros((1, IMG, IMG, 3)),
                            jnp.zeros((1, IMG, IMG, 3)), jnp.ones((1,)),
                            jnp.eye(3)[None], train=False)
    tb = convert_fullnet_reference_checkpoint(
        to_numpy_sd(tmodel), args_over.get("backbone_name", "resnet50"),
        args_over.get("rootnet_backbone_name", "hrnet32"))
    variables = merge_into(variables, tb)
    out = fmodel.apply(variables, jnp.asarray(x_reg), jnp.asarray(x_root),
                       jnp.asarray(k_value), jnp.asarray(K), train=False)
    return t_out, out


def test_fullnet_hrnet_reg_backbone_numeric_parity(ref_full_net, rng):
    """backbone_name=hrnet32 (the two-head hm+feat HRNet path feeding the
    integral decoder directly, full_net.py:299-302)."""
    t_out, out = _run_both(
        ref_full_net, rng,
        dict(backbone_name="hrnet32", rootnet_backbone_name="resnet34"),
        dict(backbone_name="hrnet32", rootnet_backbone_name="resnet34"))
    t_pose, t_rot, _, t_root_uv, t_depth, t_uvd = t_out[:6]
    # random weights make the 262k-logit softmax near-uniform, so uvd sits
    # at ~1e-2 scale and pure relative error over-penalizes ~5e-6 absolute
    # fp noise; compare with an absolute floor of 1e-5 (|uvd| <= 0.5 by
    # construction, so 1e-5 is 2e-5 of full scale)
    for name, ours, theirs, atol in [
            ("depth", out["depth"], t_depth, 0.0),
            ("uvd", out["uvd"], t_uvd, 1e-5),
            ("root_uv", out["root_uv"], t_root_uv, 0.0),
            ("pose", out["pose"], t_pose, 0.0),
            ("rot", out["rot"], t_rot, 0.0)]:
        abs_err = float(np.abs(np.asarray(ours, np.float64)
                               - np.asarray(theirs, np.float64)).max())
        assert rel_err(ours, theirs) < 2e-4 or abs_err < atol, \
            f"{name}: rel {rel_err(ours, theirs)}, abs {abs_err}"


def test_fullnet_jointmap_matmulrot_numeric_parity(ref_full_net, rng):
    """reg_joint_map (conv stack + 1-D joint soft-argmax, full_net.py:313-316)
    + rot_iterative_matmul (rotmat-composition updates, full_net.py:348-363).
    This test exposed a converter gap: joint_conv_layers/joint_final_layer
    were not mapped at all before round 3."""
    t_out, out = _run_both(
        ref_full_net, rng,
        dict(reg_joint_map=True, joint_conv_dim=[256, 256, 256],
             rot_iterative_matmul=True),
        dict(reg_joint_map=True, joint_conv_dim=[256, 256, 256],
             rot_iterative_matmul=True))
    t_pose, t_rot = t_out[0], t_out[1]
    assert rel_err(out["pose"], t_pose) < 2e-4, rel_err(out["pose"], t_pose)
    assert rel_err(out["rot"], t_rot) < 5e-4, rel_err(out["rot"], t_rot)


def test_fullnet_direct_reg_rot_numeric_parity(ref_full_net, rng):
    """direct_reg_rot: the 6-layer MLP rotation head with the xc1 skip
    (full_net.py:333-346)."""
    t_out, out = _run_both(ref_full_net, rng, dict(direct_reg_rot=True),
                           dict(direct_reg_rot=True))
    assert rel_err(out["rot"], t_out[1]) < 2e-4, rel_err(out["rot"], t_out[1])
    assert rel_err(out["pose"], t_out[0]) < 2e-4


@pytest.mark.parametrize("robot_type", ["kuka", "baxter"])
def test_fullnet_other_robots_numeric_parity(ref_full_net, rng, robot_type):
    """Kuka (DoF 7 / 8 kpts) and Baxter (DoF 15 / 17 kpts): exercises the
    per-robot DoF/nkpt table (full_net.py:43-53) and the INITIAL_JOINT_ANGLE
    mean-pose buffers end-to-end — the init_pose/init_rot buffers are NOT
    randomized, so a mismatch between the reference's tables and our
    constants would show up directly in the pose/rot head outputs."""
    import torch
    from horopose_tpu import constants as C
    from horopose_tpu.tools.torch_weights import (
        convert_fullnet_reference_checkpoint, merge_into)
    from dataset.const import INITIAL_JOINT_ANGLE

    args = make_ref_args(backbone_name="resnet34",
                         rootnet_backbone_name="resnet34")
    init_param_dict = {
        "robot_type": robot_type,
        "pose_params": INITIAL_JOINT_ANGLE,
        "cam_params": np.eye(4, dtype=float),
        "init_pose_from_mean": True,
    }
    tmodel = ref_full_net.RootNetwithRegInt(init_param_dict, args)
    tmodel.load_state_dict(randomize_state_dict(tmodel.state_dict(), rng))
    tmodel.eval()

    x_reg, x_root, k_value, K = _parity_inputs(rng)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x_reg.transpose(0, 3, 1, 2)),
                       torch.from_numpy(x_root.transpose(0, 3, 1, 2)),
                       torch.from_numpy(k_value), torch.from_numpy(K))
    t_pose, t_rot, t_trans, t_root_uv, t_depth, t_uvd, t_xyz_int, t_xyz_fk \
        = [t.numpy() for t in t_out]
    assert t_pose.shape == (2, C.DOF[robot_type])
    assert t_uvd.shape == (2, C.NUM_KEYPOINTS[robot_type], 3)

    fmodel = _our_fullnet(dict(urdf_robot_name=robot_type,
                               backbone_name="resnet34",
                               rootnet_backbone_name="resnet34"))
    key = jax.random.PRNGKey(0)
    variables = fmodel.init({"params": key, "dropout": key},
                            jnp.zeros((1, IMG, IMG, 3)),
                            jnp.zeros((1, IMG, IMG, 3)), jnp.ones((1,)),
                            jnp.eye(3)[None], train=False)
    variables = merge_into(variables, convert_fullnet_reference_checkpoint(
        to_numpy_sd(tmodel), "resnet34", "resnet34"))
    out = fmodel.apply(variables, jnp.asarray(x_reg), jnp.asarray(x_root),
                       jnp.asarray(k_value), jnp.asarray(K), train=False)
    from horopose_tpu.kinematics import Robot
    f_fk = Robot(robot_type).get_keypoints_root(
        out["pose"], out["rot"], out["trans"], root=3)
    for name, ours, theirs in [("pose", out["pose"], t_pose),
                               ("rot", out["rot"], t_rot),
                               ("trans", out["trans"], t_trans),
                               ("depth", out["depth"], t_depth),
                               ("xyz_int", out["xyz_int"], t_xyz_int),
                               ("xyz_fk", f_fk, t_xyz_fk)]:
        assert rel_err(ours, theirs) < 2e-4, \
            f"{robot_type} {name}: {rel_err(ours, theirs)}"
