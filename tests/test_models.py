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


def test_conv_transpose_d2s_equivalence():
    """The depth-to-space rewrite of the k4s2 deconv must be numerically
    identical to flax nn.ConvTranspose on the SAME kernel — it is a pure
    lowering change (MXU lane packing), not an architecture change."""
    import flax.linen as nn
    from horopose_tpu.models.full_net import conv_transpose_d2s
    rng = np.random.RandomState(3)
    for (H, W, ci, co) in [(8, 8, 16, 32), (5, 7, 3, 4), (4, 4, 64, 8)]:
        x = jnp.asarray(rng.randn(2, H, W, ci), jnp.float32)
        k = jnp.asarray(rng.randn(4, 4, ci, co) * 0.1, jnp.float32)
        ref = nn.ConvTranspose(co, (4, 4), (2, 2), padding="SAME",
                               use_bias=False).apply(
            {"params": {"kernel": k}}, x)
        got = conv_transpose_d2s(x, k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        # gradients flow and match too (training uses this path)
        g_ref = jax.grad(lambda k: nn.ConvTranspose(
            co, (4, 4), (2, 2), padding="SAME", use_bias=False).apply(
            {"params": {"kernel": k}}, x).sum())(k)
        g_got = jax.grad(lambda k: conv_transpose_d2s(x, k).sum())(k)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4)


def test_stride2_conv_s2d_equivalence():
    """Space-to-depth stem lowering (a measured-negative perf experiment,
    PERF_NOTES round 3) must stay numerically identical to the plain
    stride-2 conv so the bench comparison is apples-to-apples."""
    import flax.linen as nn
    from horopose_tpu.models.common import stride2_conv_s2d
    rng = np.random.RandomState(5)
    for (k, H, W, ci, co) in [(7, 32, 32, 3, 64), (3, 16, 24, 3, 64),
                              (3, 16, 16, 64, 32)]:
        x = jnp.asarray(rng.randn(2, H, W, ci), jnp.float32)
        w = jnp.asarray(rng.randn(k, k, ci, co) * 0.1, jnp.float32)
        ref = nn.Conv(co, (k, k), (2, 2), padding=(k - 1) // 2,
                      use_bias=False).apply({"params": {"kernel": w}}, x)
        got = stride2_conv_s2d(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
    # k = 5 (k % 4 == 1) needs a different pad split: rejected loudly, not
    # silently wrong
    with pytest.raises(ValueError, match="k % 4 == 3"):
        stride2_conv_s2d(jnp.zeros((1, 8, 8, 3)), jnp.zeros((5, 5, 3, 8)))
