"""Behavioral parity of ops/pnp.py against the OpenCV solver chain the
reference actually uses: cv2.solvePnP EPNP init + ITERATIVE refine
(/root/reference/lib/utils/BPnP.py:129-151). cv2 is installed in this
environment; these bounds were calibrated with scripts/measure_pnp_cv2.py
(B=64 per regime — full numbers in PARITY.md):

  clean / 1-5 px noise / minimal N=6 / panda FK keypoints:
      max rotation disagreement <= ~9e-4 rad, translation <= ~5e-5 m,
      residual-objective difference <= ~6e-4 px;
  near-coplanar (1 mm): median exact agreement; the few disagreements are
      the planar two-fold ambiguity, where OUR pick has the lower
      reprojection residual more often than cv2 (8/10 measured);
  exact-coplanar: the ambiguity is irreducible (both basins fit); agreement
      is not well-defined, so the bound is BEHAVIORAL — our GT rotation
      error is no worse than cv2's.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from horopose_tpu.ops.pnp import pnp
from horopose_tpu.ops.rotations import axis_angle_to_rotmat

cv2 = pytest.importorskip("cv2")

K = np.array([[615.0, 0, 320.0], [0, 615.0, 240.0], [0, 0, 1]])
B = 24


def cv2_pnp(pts2d, pts3d, Kmat):
    """Mirror of BPnP_m3d.forward (BPnP.py:129-151)."""
    out = np.zeros((pts2d.shape[0], 6), np.float64)
    for i in range(pts2d.shape[0]):
        p2 = np.ascontiguousarray(pts2d[i], np.float64).reshape(-1, 1, 2)
        p3 = np.ascontiguousarray(pts3d[i], np.float64)
        _, r0, t0 = cv2.solvePnP(p3, p2, Kmat, None,
                                 flags=cv2.SOLVEPNP_EPNP)
        _, r, t = cv2.solvePnP(p3, p2, Kmat, None,
                               flags=cv2.SOLVEPNP_ITERATIVE,
                               useExtrinsicGuess=True, rvec=r0, tvec=t0)
        out[i, :3] = r.ravel()
        out[i, 3:] = t.ravel()
    return out


def geodesic(Ra, Rb):
    tr = np.einsum("bij,bij->b", Ra, Rb)
    return np.arccos(np.clip((tr - 1) / 2, -1, 1))


def rand_rotmats(rng, n):
    q = rng.randn(n, 4)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q.T
    return np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                  2 * (x * z + w * y)], -1),
        np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                  2 * (y * z - w * x)], -1),
        np.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                  1 - 2 * (x * x + y * y)], -1),
    ], axis=1)


def project(R, t, pts3d):
    cam = np.einsum("bij,bnj->bni", R, pts3d) + t[:, None]
    uv = np.einsum("ij,bnj->bni", K, cam)
    return uv[..., :2] / uv[..., 2:3]


def solve_both(pts3d, noise_px, rng):
    R_gt = rand_rotmats(rng, B)
    t_gt = np.stack([rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
                     rng.uniform(0.6, 1.6, B)], axis=1)
    uv = project(R_gt, t_gt, pts3d) + rng.randn(B, pts3d.shape[1],
                                                2) * noise_px
    ours_R, ours_t = pnp(jnp.asarray(uv, jnp.float32),
                         jnp.asarray(pts3d, jnp.float32),
                         jnp.asarray(K, jnp.float32))
    cvs = cv2_pnp(uv, pts3d, K)
    cv_R = np.asarray(axis_angle_to_rotmat(
        jnp.asarray(cvs[:, :3], jnp.float32)), np.float64)
    return (np.asarray(ours_R, np.float64), np.asarray(ours_t, np.float64),
            cv_R, cvs[:, 3:], R_gt, uv, pts3d)


def resid_px(R, t, pts3d, uv):
    return np.sqrt(((project(R, t, pts3d) - uv) ** 2).sum(-1)).mean(-1)


@pytest.mark.parametrize("noise", [0.0, 3.0])
def test_general_points_agree(rng, noise):
    pts = np.broadcast_to(rng.uniform(-0.3, 0.3, (7, 3)),
                          (B, 7, 3)).copy()
    oR, ot, cR, ct, _, _, _ = solve_both(pts, noise, rng)
    assert geodesic(oR, cR).max() < 5e-3
    assert np.linalg.norm(ot - ct, axis=1).max() < 5e-4


def test_minimal_n6_agrees(rng):
    pts = np.broadcast_to(rng.uniform(-0.3, 0.3, (6, 3)),
                          (B, 6, 3)).copy()
    oR, ot, cR, ct, _, _, _ = solve_both(pts, 2.0, rng)
    assert geodesic(oR, cR).max() < 5e-3
    assert np.linalg.norm(ot - ct, axis=1).max() < 5e-4


def test_panda_fk_keypoints_pseudo_gt_regime(rng):
    """The exact regime of the real-set pseudo-GT path (function.py:67-75):
    FK keypoints of random panda configurations. Clean annotations must
    agree tightly; at 2 px noise the rare disagreements (<=10%) must be
    alternative optima, not failures — our pick's reprojection residual may
    not be materially worse than cv2's."""
    from horopose_tpu import constants as C
    from horopose_tpu.kinematics import Robot
    robot = Robot("panda")
    lo, hi = np.asarray(C.JOINT_BOUNDS["panda"]).T
    q = rng.uniform(lo, hi, (B, robot.dof))
    pts = np.asarray(robot.get_keypoints_only_fk(
        jnp.asarray(q, jnp.float32)), np.float64)

    oR, ot, cR, ct, _, _, _ = solve_both(pts, 0.0, rng)
    assert geodesic(oR, cR).max() < 5e-3

    oR, ot, cR, ct, _, uv, p3 = solve_both(pts, 2.0, rng)
    agree = geodesic(oR, cR)
    dis = agree > 1e-2
    assert dis.mean() <= 0.10, f"{dis.sum()}/{B} disagreements"
    if dis.any():
        r_ours = resid_px(oR[dis], ot[dis], p3[dis], uv[dis])
        r_cv = resid_px(cR[dis], ct[dis], p3[dis], uv[dis])
        assert (r_ours < r_cv + 0.5).all(), (r_ours, r_cv)


def test_coplanar_behavioral_bound(rng):
    """Exact-coplanar sets: the planar two-fold ambiguity makes basin
    choice solver-specific (cv2's EPnP picks one arbitrarily too), so the
    bound is on BEHAVIOR: finite outputs always, and median GT rotation
    error no worse than cv2's (measured: ours 1.7e-2 vs cv2 2.3e-2 rad)."""
    pts = np.broadcast_to(rng.uniform(-0.3, 0.3, (7, 3)),
                          (B, 7, 3)).copy()
    pts[..., 2] = 0.0
    oR, ot, cR, ct, R_gt, _, _ = solve_both(pts, 1.0, rng)
    assert np.isfinite(oR).all() and np.isfinite(ot).all()
    assert np.median(geodesic(oR, R_gt)) <= \
        np.median(geodesic(cR, R_gt)) * 1.5 + 1e-3
