"""Metrics parity: vectorized AUC sweeps vs the reference's literal loops
(metrics.py:117-162), and compute_metrics_batch vs a direct oracle."""

import numpy as np

from horopose_tpu.core.metrics import (_auc, compute_metrics_batch,
                                       summary_add_pck)
from horopose_tpu.kinematics import Robot


def loop_auc(dis, limit, step):
    """The reference's literal threshold loop + trapezoid."""
    thresholds = np.arange(0.0, limit, step)
    counts = [np.mean(dis <= v) for v in thresholds]
    return float(np.trapezoid(counts, dx=step) / limit)


def test_auc_matches_reference_loop(rng):
    dis3d = rng.uniform(0, 0.3, 400)
    # coarser grid for the loop oracle runtime; identical semantics
    for limit, step in ((0.1, 1e-4), (20.0, 0.05)):
        fast = _auc(dis3d * (200 if limit == 20 else 1), limit, step)
        slow = loop_auc(dis3d * (200 if limit == 20 else 1), limit, step)
        np.testing.assert_allclose(fast, slow, atol=1e-12)


def test_auc_exact_grid_sizes():
    """The production grids must match the reference exactly: ADD
    arange(0, 0.1, 1e-5) = 10000 points; PCK arange(0, 20, 0.01) = 2000."""
    assert len(np.arange(0.0, 0.1, 1e-5)) == 10000
    assert len(np.arange(0.0, 20.0, 0.01)) == 2000
    # spot value: all distances at exactly 0 -> AUC approaches 1 minus the
    # first-trapezoid half-step edge effect
    dis = np.zeros(10)
    a = _auc(dis, 0.1, 1e-5)
    assert abs(a - loop_auc(dis, 0.1, 1e-5)) < 1e-12


def test_summary_fixed_thresholds(rng):
    dis3d = rng.uniform(0, 0.12, 500)
    dis2d = rng.uniform(0, 25.0, 500)
    s = summary_add_pck({"dis3d": dis3d, "dis2d": dis2d})
    for th in (1, 5, 10, 20, 40, 60, 80, 100):
        np.testing.assert_allclose(s[f"ADD_{th}_mm"],
                                   np.mean(dis3d <= th * 1e-3))
    for th in (2.5, 5.0, 7.5, 10.0, 12.5, 15.0, 17.5, 20.0):
        np.testing.assert_allclose(s[f"PCK_{th}_pixel"],
                                   np.mean(dis2d <= th))


def test_compute_metrics_batch_oracle(rng):
    robot = Robot("panda")
    B, K = 5, 7
    gt3 = (rng.randn(B, K, 3) * 0.2 + [0, 0, 1.5]).astype(np.float32)
    pr3 = gt3 + rng.randn(B, K, 3).astype(np.float32) * 0.01
    gt2 = rng.uniform(-50, 700, (B, K, 2)).astype(np.float32)
    Ko = np.tile(np.asarray([[320.0, 0, 320], [0, 320, 240], [0, 0, 1]],
                            np.float32)[None], (B, 1, 1))
    gtj = rng.randn(B, 8).astype(np.float32)
    prj = gtj + rng.randn(B, 8).astype(np.float32) * 0.1
    m = compute_metrics_batch(
        robot=robot, gt_keypoints3d=gt3, gt_keypoints2d=gt2, K_original=Ko,
        gt_joint=gtj, pred_keypoints3d=pr3, pred_joint=prj,
        reference_keypoint_id=3)

    # per-image ADD oracle
    e3 = np.linalg.norm(pr3 - gt3, axis=2)
    np.testing.assert_allclose(m["image_dis3d_avg"], e3.mean(axis=1),
                               rtol=1e-6)
    # PCK validity mask (0..640 x 0..480 frame, inclusive upper bounds)
    proj = np.einsum("bij,bnj->bni", Ko, pr3)
    p2 = proj[..., :2] / proj[..., 2:3]
    e2 = np.linalg.norm(p2 - gt2, axis=2)
    valid = ((gt2[..., 0] <= 640) & (gt2[..., 0] >= 0) &
             (gt2[..., 1] <= 480) & (gt2[..., 1] >= 0))
    expect = (e2 * valid).sum(axis=1) / valid.sum(axis=1)
    np.testing.assert_allclose(m["image_dis2d_avg"], expect, rtol=1e-5)
    # panda excludes the finger joint from the per-image joint-error mean
    ej = np.abs(gtj - prj)
    np.testing.assert_allclose(m["image_l1jointerror_avg"],
                               ej[:, :-1].mean(axis=1), rtol=1e-6)
    # root-relative depth error
    rel_p = pr3[:, :, 2] - pr3[:, 3:4, 2]
    rel_g = gt3[:, :, 2] - gt3[:, 3:4, 2]
    np.testing.assert_allclose(m["batch_error_relative"],
                               np.abs(rel_p - rel_g).mean(axis=1), rtol=1e-5)
