"""PnP: recovery of known poses from synthetic projections + gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from horopose_tpu.ops.pnp import pnp, pnp_theta
from horopose_tpu.ops.rotations import geodesic_distance




def random_rotmats(rng, n):
    a = rng.randn(n, 3, 3).astype(np.float32)
    q, r = np.linalg.qr(a)
    d = np.sign(np.diagonal(r, axis1=-2, axis2=-1))
    q = q * d[:, None, :]
    det = np.linalg.det(q)
    q[det < 0, :, 0] *= -1
    return q.astype(np.float32)


def make_problem(rng, B=4, N=8, noise=0.0):
    K = np.array([[320.0, 0, 320.0], [0, 320.0, 240.0], [0, 0, 1]],
                 np.float32)
    R = random_rotmats(rng, B)
    t = np.stack([rng.uniform(-0.3, 0.3, B), rng.uniform(-0.3, 0.3, B),
                  rng.uniform(1.0, 2.5, B)], axis=1).astype(np.float32)
    pts3d = rng.uniform(-0.4, 0.4, (B, N, 3)).astype(np.float32)
    cam = np.einsum("bij,bnj->bni", R, pts3d) + t[:, None]
    proj = np.einsum("ij,bnj->bni", K, cam)
    pts2d = proj[..., :2] / proj[..., 2:3]
    if noise:
        pts2d = pts2d + rng.randn(*pts2d.shape).astype(np.float32) * noise
    return pts2d, pts3d, K, R, t


def test_pnp_exact_recovery(rng):
    pts2d, pts3d, K, R, t = make_problem(rng, B=6, N=8)
    R_est, t_est = pnp(jnp.asarray(pts2d), jnp.asarray(pts3d),
                       jnp.asarray(K))
    ang = np.asarray(geodesic_distance(R_est, jnp.asarray(R)))
    np.testing.assert_array_less(ang, 1e-3)
    np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-3)


def test_pnp_noisy_recovery(rng):
    pts2d, pts3d, K, R, t = make_problem(rng, B=4, N=10, noise=1.0)
    R_est, t_est = pnp(jnp.asarray(pts2d), jnp.asarray(pts3d),
                       jnp.asarray(K))
    ang = np.asarray(geodesic_distance(R_est, jnp.asarray(R)))
    # 1px noise at f=320 should stay within a few degrees
    np.testing.assert_array_less(ang, np.deg2rad(5.0))
    np.testing.assert_allclose(np.asarray(t_est), t, atol=0.05)


def test_pnp_gradients_finite_and_match_fd(rng):
    pts2d, pts3d, K, _, _ = make_problem(rng, B=2, N=7)
    Kb = np.broadcast_to(K, (2, 3, 3)).copy()

    def loss(p3):
        theta = pnp_theta(jnp.asarray(pts2d), p3, jnp.asarray(Kb))
        return jnp.sum(theta ** 2)

    g = jax.grad(loss)(jnp.asarray(pts3d))
    assert np.isfinite(np.asarray(g)).all()
    # finite differences on one coordinate
    eps = 1e-4
    d = np.zeros_like(pts3d)
    d[0, 2, 1] = eps
    fd = (float(loss(jnp.asarray(pts3d + d))) -
          float(loss(jnp.asarray(pts3d - d)))) / (2 * eps)
    np.testing.assert_allclose(float(np.asarray(g)[0, 2, 1]), fd, rtol=5e-2,
                               atol=1e-4)


def test_pnp_under_jit(rng):
    pts2d, pts3d, K, R, _ = make_problem(rng, B=2, N=8)
    f = jax.jit(lambda a, b, c: pnp(a, b, c))
    R_est, _ = f(jnp.asarray(pts2d), jnp.asarray(pts3d), jnp.asarray(K))
    ang = np.asarray(geodesic_distance(R_est, jnp.asarray(R)))
    np.testing.assert_array_less(ang, 1e-3)
