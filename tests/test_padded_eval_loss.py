"""Padded-batch eval logging is EXACT (round-4 advisor finding).

The validate loops pad a final partial batch up to the full batch size so
it can shard over the data mesh axis, attaching a `_valid` row mask. The
eval steps compute every logged loss scalar as a masked mean over that
mask, so the padded duplicate rows contribute exactly nothing — the logged
scalars equal the ones the unpadded batch would log.
"""

import jax
import jax.numpy as jnp
import numpy as np

from horopose_tpu.core import losses as L
from horopose_tpu.data.samplers import pad_batch
from test_sharding_equivalence import _fake_batch, _setup


def test_row_mean_matches_unpadded_mean():
    r = np.random.RandomState(0)
    x = r.randn(5, 3, 2).astype(np.float32)
    pad = np.concatenate([x, np.tile(x[-1:], (3, 1, 1))])
    mask = (np.arange(8) < 5).astype(np.float32)
    np.testing.assert_allclose(
        float(L.row_mean(jnp.asarray(pad), jnp.asarray(mask))),
        float(x.mean()), rtol=1e-6)
    # no mask: plain mean
    np.testing.assert_allclose(float(L.row_mean(jnp.asarray(x))),
                               float(x.mean()), rtol=1e-6)


def test_masked_norm_loss_row_mask_combines_with_entry_mask():
    r = np.random.RandomState(1)
    pred = r.randn(4, 6, 3).astype(np.float32)
    gt = r.randn(4, 6, 3).astype(np.float32)
    entry_mask = (r.rand(4, 6) > 0.3).astype(np.float32)
    # pad rows 2..3 by duplicating row 1
    pred_p = np.concatenate([pred[:2], np.tile(pred[1:2], (2, 1, 1))])
    gt_p = np.concatenate([gt[:2], np.tile(gt[1:2], (2, 1, 1))])
    em_p = np.concatenate([entry_mask[:2], np.tile(entry_mask[1:2], (2, 1))])
    rm = np.array([1, 1, 0, 0], np.float32)
    got = float(L.masked_norm_loss(jnp.asarray(pred_p), jnp.asarray(gt_p),
                                   jnp.asarray(em_p),
                                   row_mask=jnp.asarray(rm)))
    want = float(L.masked_norm_loss(jnp.asarray(pred[:2]),
                                    jnp.asarray(gt[:2]),
                                    jnp.asarray(entry_mask[:2])))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_trans_outlier_downweight_row_mask():
    r = np.random.RandomState(2)
    pred = r.randn(3, 3).astype(np.float32) * 2.0  # big errors: outlier path
    gt = r.randn(3, 3).astype(np.float32)
    pred_p = np.concatenate([pred, np.tile(pred[-1:], (5, 1))])
    gt_p = np.concatenate([gt, np.tile(gt[-1:], (5, 1))])
    rm = (np.arange(8) < 3).astype(np.float32)
    got = float(L.trans_l2norm_with_outlier_downweight(
        jnp.asarray(pred_p), jnp.asarray(gt_p), row_mask=jnp.asarray(rm)))
    want = float(L.trans_l2norm_with_outlier_downweight(
        jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_full_eval_step_padded_logs_match_unpadded():
    """End-to-end: eval_step on a padded batch + `_valid` logs the same
    scalars as on the raw partial batch."""
    from horopose_tpu.core.engine import build_full_eval_step
    cfg, robot, state, _, size = _setup()
    from horopose_tpu import constants as C
    from horopose_tpu.models import FullNet
    model = FullNet(robot_type="panda", dof=8, num_keypoints=7,
                    image_size=size, depth_dim=8,
                    backbone_name="resnet18",
                    rootnet_backbone_name="resnet18",
                    init_pose=tuple(C.initial_joint_vector(
                        "mean", "panda").tolist()))
    evaluate = build_full_eval_step(cfg, model, robot)

    n_valid, B = 5, 8
    batch_np = _fake_batch(n_valid, size, robot.num_keypoints, robot.dof)
    # knock out some keypoint validity so combined masks are exercised
    batch_np["other"]["valid_mask_crop"][0, :3] = 0.0

    padded, n = pad_batch({k: v for k, v in batch_np.items()}, B)
    assert n == n_valid
    padded["_valid"] = (np.arange(B) < n_valid).astype(np.float32)

    # masking exactness: replace the duplicate pad rows with GARBAGE — if
    # any padded row leaked into a loss, the scalars would move wildly.
    # Same shapes -> same compiled reductions, so this comparison is tight.
    r = np.random.RandomState(7)

    def scramble(x):
        x = np.array(x, copy=True)
        if x.ndim >= 1 and x.shape[0] == B:
            pad_rows = r.uniform(0.1, 0.9, x[n_valid:].shape)
            x[n_valid:] = pad_rows.astype(x.dtype) * (
                255 if x.dtype == np.uint8 else 1)
        return x

    garbage = jax.tree.map(scramble, padded)
    garbage["_valid"] = padded["_valid"]

    _, _, logs_pad = evaluate(state, jax.tree.map(jnp.asarray, padded))
    _, _, logs_garbage = evaluate(state, jax.tree.map(jnp.asarray, garbage))
    _, _, logs_raw = evaluate(state, jax.tree.map(jnp.asarray, batch_np))

    assert set(logs_pad) == set(logs_raw)
    for k in logs_raw:
        np.testing.assert_allclose(float(logs_pad[k]),
                                   float(logs_garbage[k]),
                                   rtol=1e-5, atol=1e-7,
                                   err_msg=f"{k}: pad rows leak into logs")
        # cross-batch-shape comparison: XLA reduction order differs between
        # B=5 and B=8 programs, and project_points divides by near-zero
        # depths on this random batch, amplifying benign fp differences —
        # the predictions themselves agree to ~2e-6
        np.testing.assert_allclose(float(logs_pad[k]), float(logs_raw[k]),
                                   rtol=2e-3, err_msg=k)


def test_depthnet_eval_step_padded_logs_match_unpadded():
    from horopose_tpu.core.engine import (build_depthnet_eval_step,
                                          create_train_state, make_optimizer)
    from horopose_tpu.models import RootNet
    cfg, robot, _, _, size = _setup()
    cfg.use_rootnet_xy_branch = False
    model = RootNet(backbone_name="resnet34", pred_xy=False)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((1, size, size, 3)), jnp.ones((1,)),
                           train=False)
    state = create_train_state(variables, make_optimizer(cfg, 1))
    evaluate = build_depthnet_eval_step(cfg, model)

    n_valid, B = 3, 8
    batch_np = _fake_batch(n_valid, size, robot.num_keypoints, robot.dof)
    padded, n = pad_batch({k: v for k, v in batch_np.items()}, B)
    padded["_valid"] = (np.arange(B) < n_valid).astype(np.float32)

    out_pad = evaluate(state, jax.tree.map(jnp.asarray, padded))
    out_raw = evaluate(state, jax.tree.map(jnp.asarray, batch_np))
    np.testing.assert_allclose(float(out_pad["loss"]),
                               float(out_raw["loss"]), rtol=1e-6)
    # per-sample errors of the valid rows are unchanged
    np.testing.assert_allclose(np.asarray(out_pad["error_depth"])[:n_valid],
                               np.asarray(out_raw["error_depth"]),
                               rtol=1e-6)
