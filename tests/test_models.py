"""Model smoke + shape tests on small inputs (fast on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from horopose_tpu import constants as C
from horopose_tpu.models import FullNet, RootNet, get_hrnet, get_resnet
from horopose_tpu.ops import transforms as T


def _init_and_apply(model, args, train=False):
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, *args, train=train)
    out = model.apply(variables, *args, train=train,
                      rngs={"dropout": key},
                      mutable=["batch_stats"] if train else False)
    return variables, out


def test_resnet50_shapes():
    model = get_resnet("resnet50")
    x = jnp.zeros((2, 64, 64, 3))
    _, out = _init_and_apply(model, (x,))
    assert out.shape == (2, 2, 2, 2048)
    assert model.feature_channels == 2048


def test_resnet34_shapes():
    model = get_resnet("resnet34")
    x = jnp.zeros((1, 64, 64, 3))
    _, out = _init_and_apply(model, (x,))
    assert out.shape == (1, 2, 2, 512)


def test_hrnet_heads():
    model = get_hrnet(32, num_joints=7, depth_dim=8)
    x = jnp.zeros((1, 64, 64, 3))
    _, (hm, feat) = _init_and_apply(model, (x,))
    assert hm.shape == (1, 16, 16, 7 * 8)
    assert feat.shape == (1, 2048)


def test_hrnet_feat_only():
    model = get_hrnet(32, generate_hm=False, generate_feat=True)
    x = jnp.zeros((1, 64, 64, 3))
    _, feat = _init_and_apply(model, (x,))
    assert feat.shape == (1, 2048)


def test_rootnet_forward():
    model = RootNet(backbone_name="resnet50")
    x = jnp.zeros((2, 64, 64, 3))
    k = jnp.asarray([1500.0, 1600.0])
    _, depth = _init_and_apply(model, (x, k))
    assert depth.shape == (2, 1)


def test_rootnet_xy_offset_fc():
    model = RootNet(backbone_name="resnet34", pred_xy=True, use_offset=True,
                    add_fc=True)
    x = jnp.zeros((2, 64, 64, 3))
    k = jnp.asarray([1500.0, 1600.0])
    _, coord = _init_and_apply(model, (x, k), train=True)
    coord = coord[0] if isinstance(coord, tuple) else coord
    assert coord.shape == (2, 3)


def make_fullnet(robot_type="panda", **kw):
    dof = C.DOF[robot_type]
    nkpt = C.NUM_KEYPOINTS[robot_type]
    return FullNet(
        robot_type=robot_type, dof=dof, num_keypoints=nkpt,
        image_size=64, depth_dim=8,
        init_pose=tuple(C.initial_joint_vector("mean", robot_type).tolist()),
        **kw)


@pytest.mark.parametrize("robot_type", ["panda", "kuka"])
def test_fullnet_forward(robot_type):
    model = make_fullnet(robot_type, backbone_name="resnet50",
                         rootnet_backbone_name="resnet34")
    B = 2
    x = jnp.zeros((B, 64, 64, 3))
    k = jnp.full((B,), 1500.0)
    K = jnp.broadcast_to(T.make_K(320.0, 320.0, 32.0, 32.0), (B, 3, 3))
    _, out = _init_and_apply(model, (x, x, k, K))
    dof, nkpt = C.DOF[robot_type], C.NUM_KEYPOINTS[robot_type]
    assert out["pose"].shape == (B, dof)
    assert out["rot"].shape == (B, 6)
    assert out["trans"].shape == (B, 3)
    assert out["root_uv"].shape == (B, 2)
    assert out["depth"].shape == (B, 1)
    assert out["uvd"].shape == (B, nkpt, 3)
    assert out["xyz_int"].shape == (B, nkpt, 3)
    # fix_root pins the root z
    np.testing.assert_allclose(np.asarray(out["uvd"][:, 3, 2]), 0.0,
                               atol=1e-7)
    # pose starts from the mean-init and moves by residuals
    assert np.isfinite(np.asarray(out["pose"])).all()


def test_fullnet_train_mode_with_dropout_and_bn():
    model = make_fullnet("panda", backbone_name="resnet50",
                         rootnet_backbone_name="resnet34")
    B = 2
    x = jnp.zeros((B, 64, 64, 3))
    k = jnp.full((B,), 1500.0)
    K = jnp.broadcast_to(T.make_K(320.0, 320.0, 32.0, 32.0), (B, 3, 3))
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, x, x, k, K,
                           train=True)
    (out, mutated) = model.apply(variables, x, x, k, K, train=True,
                                 rngs={"dropout": key},
                                 mutable=["batch_stats"])
    assert "batch_stats" in mutated
    assert out["pose"].shape == (B, 8)


def test_fullnet_rot_variants():
    for kw in (dict(direct_reg_rot=True), dict(rot_iterative_matmul=True)):
        model = make_fullnet("panda", backbone_name="resnet50",
                             rootnet_backbone_name="resnet34", **kw)
        B = 1
        x = jnp.zeros((B, 64, 64, 3))
        k = jnp.full((B,), 1500.0)
        K = jnp.broadcast_to(T.make_K(320.0, 320.0, 32.0, 32.0), (B, 3, 3))
        _, out = _init_and_apply(model, (x, x, k, K))
        assert out["rot"].shape == (B, 6)


def test_fullnet_joint_map_variant():
    model = make_fullnet("panda", backbone_name="resnet50",
                         rootnet_backbone_name="resnet34",
                         reg_joint_map=True,
                         joint_bounds=C.JOINT_BOUNDS["panda"])
    B = 1
    x = jnp.zeros((B, 64, 64, 3))
    k = jnp.full((B,), 1500.0)
    K = jnp.broadcast_to(T.make_K(320.0, 320.0, 32.0, 32.0), (B, 3, 3))
    _, out = _init_and_apply(model, (x, x, k, K))
    pose = np.asarray(out["pose"])
    bounds = C.JOINT_BOUNDS["panda"]
    assert (pose >= bounds[:, 0] - 1e-4).all()
    assert (pose <= bounds[:, 1] + 1e-4).all()


def test_fullnet_multi_kp():
    model = make_fullnet("panda", backbone_name="resnet50",
                         rootnet_backbone_name="resnet34", multi_kp=True,
                         kps_need_depth=(0, 3, 6))
    B = 1
    x = jnp.zeros((B, 64, 64, 3))
    k = jnp.full((B,), 1500.0)
    K = jnp.broadcast_to(T.make_K(320.0, 320.0, 32.0, 32.0), (B, 3, 3))
    _, out = _init_and_apply(model, (x, x, k, K))
    assert out["depths"].shape == (B, 3)
