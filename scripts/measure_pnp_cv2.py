"""Measure agreement between ops/pnp.py and the OpenCV solver chain the
reference actually uses (EPNP init + ITERATIVE refine with extrinsic guess,
/root/reference/lib/utils/BPnP.py:129-151), across the regimes that matter
for real-set pseudo-GT: clean, noisy (1-5 px), near-coplanar, minimal-N,
and real panda FK keypoint geometry.

Run: JAX_PLATFORMS=cpu python scripts/measure_pnp_cv2.py
Prints one summary line per regime; numbers are recorded in PARITY.md.
"""

import os
import sys

# force CPU: the container's sitecustomize sets JAX_PLATFORMS=axon (remote
# TPU) in every process; the env var alone does not flip it back
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def cv2_pnp(pts2d, pts3d, K):
    """Mirror of BPnP_m3d.forward (BPnP.py:129-151): per-sample EPNP then
    iterative refine. Returns (B, 6) [axis-angle, t]."""
    import cv2 as cv
    B = pts2d.shape[0]
    out = np.zeros((B, 6), np.float64)
    for i in range(B):
        p2 = np.ascontiguousarray(pts2d[i], np.float64).reshape(-1, 1, 2)
        p3 = np.ascontiguousarray(pts3d[i], np.float64)
        Kd = np.asarray(K, np.float64)
        ok, r0, t0 = cv.solvePnP(p3, p2, Kd, None, flags=cv.SOLVEPNP_EPNP)
        ok, r, t = cv.solvePnP(p3, p2, Kd, None,
                               flags=cv.SOLVEPNP_ITERATIVE,
                               useExtrinsicGuess=True, rvec=r0, tvec=t0)
        out[i, :3] = r.ravel()
        out[i, 3:] = t.ravel()
    return out


def geodesic(Ra, Rb):
    tr = np.einsum("bij,bij->b", Ra, Rb)
    return np.arccos(np.clip((tr - 1) / 2, -1, 1))


def rand_rotmats(rng, B):
    q = rng.randn(B, 4)
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


def project(R, t, pts3d, K):
    cam = np.einsum("bij,bnj->bni", R, pts3d) + t[:, None]
    uv = np.einsum("ij,bnj->bni", K, cam)
    return uv[..., :2] / uv[..., 2:3]


def run_case(name, pts3d, noise_px, rng, B=64):
    import jax.numpy as jnp
    from horopose_tpu.ops.pnp import pnp
    from horopose_tpu.ops.rotations import axis_angle_to_rotmat

    K = np.array([[615.0, 0, 320.0], [0, 615.0, 240.0], [0, 0, 1]])
    R_gt = rand_rotmats(rng, B)
    t_gt = np.stack([rng.uniform(-0.2, 0.2, B), rng.uniform(-0.2, 0.2, B),
                     rng.uniform(0.6, 1.6, B)], axis=1)
    uv = project(R_gt, t_gt, pts3d, K)
    uv_noisy = uv + rng.randn(*uv.shape) * noise_px

    ours_R, ours_t = pnp(jnp.asarray(uv_noisy, jnp.float32),
                         jnp.asarray(pts3d, jnp.float32),
                         jnp.asarray(K, jnp.float32))
    ours_R = np.asarray(ours_R, np.float64)
    ours_t = np.asarray(ours_t, np.float64)
    cv = cv2_pnp(uv_noisy, pts3d, K)
    cv_R = np.asarray(axis_angle_to_rotmat(jnp.asarray(cv[:, :3],
                                                       jnp.float32)),
                      np.float64)
    cv_t = cv[:, 3:]

    agree_rot = geodesic(ours_R, cv_R)
    agree_t = np.linalg.norm(ours_t - cv_t, axis=1)
    gt_rot_ours = geodesic(ours_R, R_gt)
    gt_rot_cv = geodesic(cv_R, R_gt)
    # reprojection errors: do the two solvers reach the same objective value?
    uv_ours = project(ours_R, ours_t, pts3d, K)
    uv_cv = project(cv_R, cv_t, pts3d, K)
    res_ours = np.sqrt(((uv_ours - uv_noisy) ** 2).sum(-1)).mean(-1)
    res_cv = np.sqrt(((uv_cv - uv_noisy) ** 2).sum(-1)).mean(-1)
    print(f"{name:28s} rot-agree med {np.median(agree_rot):.2e} "
          f"max {agree_rot.max():.2e} rad | t-agree med "
          f"{np.median(agree_t):.2e} max {agree_t.max():.2e} m | "
          f"gtrot ours/cv {np.median(gt_rot_ours):.2e}/"
          f"{np.median(gt_rot_cv):.2e} | resid ours-cv "
          f"max {np.abs(res_ours - res_cv).max():.2e} px")
    # tail attribution: when the two solvers land on different optima,
    # which side found the lower-residual / lower-GT-error pose?
    dis = agree_rot > 1e-2
    if dis.any():
        ours_better_res = int((res_ours[dis] < res_cv[dis] - 1e-6).sum())
        cv_better_res = int((res_cv[dis] < res_ours[dis] - 1e-6).sum())
        ours_better_gt = int((gt_rot_ours[dis] < gt_rot_cv[dis]).sum())
        print(f"    disagree n={int(dis.sum())}: lower-resid "
              f"ours/cv2 = {ours_better_res}/{cv_better_res}; lower-GT-rot "
              f"ours/cv2 = {ours_better_gt}/{int(dis.sum()) - ours_better_gt}")
    return agree_rot, agree_t


def main():
    rng = np.random.RandomState(0)
    # general (non-coplanar) cloud, N=7 like panda
    pts_gen = rng.uniform(-0.3, 0.3, (7, 3))
    # near-coplanar: plane + 1 mm jitter
    pts_plane = pts_gen.copy()
    pts_plane[:, 2] = 0.0
    pts_near = pts_plane + rng.randn(7, 3) * 1e-3
    # minimal N=6
    pts_min = rng.uniform(-0.3, 0.3, (6, 3))

    B = 64

    def bcast(p):
        return np.broadcast_to(p, (B,) + p.shape).copy()

    run_case("clean N=7", bcast(pts_gen), 0.0, rng, B)
    run_case("noise 1px", bcast(pts_gen), 1.0, rng, B)
    run_case("noise 3px", bcast(pts_gen), 3.0, rng, B)
    run_case("noise 5px", bcast(pts_gen), 5.0, rng, B)
    run_case("minimal N=6 noise 2px", bcast(pts_min), 2.0, rng, B)
    run_case("near-coplanar 1mm 1px", bcast(pts_near), 1.0, rng, B)
    run_case("exact-coplanar 1px", bcast(pts_plane), 1.0, rng, B)

    # real panda FK keypoints at random joint vectors (the pseudo-GT path:
    # function.py:67-75 runs PnP on gt 2D keypoints vs FK world points)
    from horopose_tpu import constants as C
    from horopose_tpu.kinematics import Robot
    import jax.numpy as jnp
    robot = Robot("panda")
    lo, hi = np.asarray(C.JOINT_BOUNDS["panda"]).T
    q = rng.uniform(lo, hi, (B, robot.dof))
    pts_fk = np.asarray(robot.get_keypoints_only_fk(jnp.asarray(
        q, jnp.float32)), np.float64)
    run_case("panda FK kps 0px", pts_fk, 0.0, rng, B)
    run_case("panda FK kps 2px", pts_fk, 2.0, rng, B)


if __name__ == "__main__":
    main()
