import jax
import jax.numpy as jnp
import numpy as np

from horopose_tpu.ops import transforms as T
from horopose_tpu.ops.integral import (heatmap_integral_joint,
                                       heatmap_integral_pose, soft_argmax_3d)


def test_soft_argmax_delta_peak(rng):
    """A sharp peak at voxel (d, h, w) must decode to that coordinate."""
    B, K, D, H, W = 2, 3, 8, 16, 16
    logits = np.zeros((B, K, D, H, W), np.float32)
    targets = []
    for b in range(B):
        row = []
        for k in range(K):
            d, h, w = rng.randint(0, D), rng.randint(0, H), rng.randint(0, W)
            logits[b, k, d, h, w] = 60.0  # ~delta after softmax
            row.append((w, h, d))
        targets.append(row)
    uvd = np.asarray(soft_argmax_3d(jnp.asarray(logits).reshape(B, K, -1),
                                    D, H, W))
    for b in range(B):
        for k in range(K):
            w, h, d = targets[b][k]
            np.testing.assert_allclose(
                uvd[b, k], [w / W - 0.5, h / H - 0.5, d / D - 0.5], atol=1e-4)


def test_soft_argmax_matches_bruteforce(rng):
    """Against a direct dense softmax-expectation computation."""
    B, K, D, H, W = 2, 4, 4, 8, 8
    logits = rng.randn(B, K, D, H, W).astype(np.float32)
    uvd = np.asarray(soft_argmax_3d(jnp.asarray(logits).reshape(B, K, -1),
                                    D, H, W))
    p = np.exp(logits - logits.reshape(B, K, -1).max(-1)[..., None, None, None])
    p = p / p.reshape(B, K, -1).sum(-1)[..., None, None, None]
    zz, yy, xx = np.meshgrid(np.arange(D), np.arange(H), np.arange(W),
                             indexing="ij")
    ex = (p * xx).reshape(B, K, -1).sum(-1) / W - 0.5
    ey = (p * yy).reshape(B, K, -1).sum(-1) / H - 0.5
    ez = (p * zz).reshape(B, K, -1).sum(-1) / D - 0.5
    np.testing.assert_allclose(uvd, np.stack([ex, ey, ez], -1), atol=1e-5)


def test_heatmap_integral_pose_fixroot(rng):
    B, K, D, HW = 2, 7, 8, 16
    logits = jnp.asarray(rng.randn(B, K * D, HW, HW).astype(np.float32))
    Kmat = jnp.broadcast_to(T.make_K(320.0, 320.0, 128.0, 128.0), (B, 3, 3))
    root_trans = jnp.asarray([[0, 0, 1.5]] * B, jnp.float32)
    uvd, xyz = heatmap_integral_pose(
        logits, num_joints=K, depth_dim=D, height_dim=HW, width_dim=HW,
        image_size=256.0, bbox_3d_shape=(1300, 1300, 1300), K=Kmat,
        root_trans=root_trans, rootid=3, fixroot=True)
    assert uvd.shape == (B, K, 3) and xyz.shape == (B, K, 3)
    np.testing.assert_allclose(np.asarray(uvd[:, 3, 2]), 0.0, atol=1e-7)
    # root keypoint's absolute z must equal the root depth
    np.testing.assert_allclose(np.asarray(xyz[:, 3, 2]), 1.5, atol=1e-5)


def test_heatmap_integral_pose_gumbel_sampling(rng):
    B, K, D, HW = 1, 2, 4, 8
    logits = jnp.asarray(rng.randn(B, K * D, HW, HW).astype(np.float32))
    Kmat = jnp.broadcast_to(T.make_K(320.0, 320.0, 128.0, 128.0), (B, 3, 3))
    root_trans = jnp.asarray([[0, 0, 1.0]], jnp.float32)
    uvd, _ = heatmap_integral_pose(
        logits, num_joints=K, depth_dim=D, height_dim=HW, width_dim=HW,
        image_size=256.0, bbox_3d_shape=(2300, 2300, 2300), K=Kmat,
        root_trans=root_trans, norm_type="sampling",
        rng=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(uvd)).all()
    assert (np.abs(np.asarray(uvd)) <= 0.5 + 1e-6).all()


def test_heatmap_integral_joint(rng):
    B, dof, R = 2, 8, 64
    bounds = np.stack([np.full(dof, -2.0), np.full(dof, 2.0)], -1)
    logits = np.zeros((B, dof, R), np.float32)
    idx = rng.randint(0, R, (B, dof))
    for b in range(B):
        for j in range(dof):
            logits[b, j, idx[b, j]] = 60.0
    joints = np.asarray(heatmap_integral_joint(
        jnp.asarray(logits), dof=dof, joint_bounds=jnp.asarray(bounds)))
    expect = idx / R * 4.0 - 2.0
    np.testing.assert_allclose(joints, expect, atol=1e-3)


def test_integral_grad_flows(rng):
    B, K, D, HW = 1, 2, 4, 8
    logits = jnp.asarray(rng.randn(B, K * D, HW, HW).astype(np.float32))

    def f(l):
        uvd = soft_argmax_3d(l.reshape(B, K, -1), D, HW, HW)
        return jnp.sum(uvd ** 2)

    g = jax.grad(f)(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
