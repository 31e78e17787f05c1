"""Multi-epoch ADD-AUC training regression on a fabricated DREAM set.

Stronger than the single-batch overfit tests (test_convergence.py): trains
the FULL supervised chain (loader -> GT prep -> both backbones -> integral +
iterative heads -> FK lift -> 10-loss battery -> Adam + exponential-decay
schedule) for hundreds of epochs and asserts the evaluation-side ADD AUC
(the BASELINE.json north-star metric, reference surface
/root/reference/scripts/test.py:244-274) crosses a meaningful threshold.

The eval set contains the same generated samples as the train set
(memorization regression): the images are random noise, so generalization
is undefined, but driving ADD AUC to ~0.9 requires the predicted joint
angles, rotation, AND absolute translation (k-value depth) to converge to
sub-2cm accuracy through the exact metric grid (0-0.1 m, 1e-5 steps) — a
sign/scale error anywhere in the GT prep, losses, FK, or uvd->xyz lift
keeps it near zero.

Measured trajectory (virtual single CPU device, resnet18 backbones, 64x64):
AUC 0.00 @ epoch 150 -> 0.82 @ 350 -> 0.91 @ 500.
"""

import jax
import numpy as np
import pytest
import yaml

from fixtures import make_synthetic_dream_dataset
from horopose_tpu.config import make_cfg

N_EPOCHS = 450
EVAL_EVERY = 50


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    base = tmp_path_factory.mktemp("aucreg")
    data = base / "dream"
    train_dir = make_synthetic_dream_dataset(data, "panda", n_images=4,
                                             split="train_dr", seed=0)
    # same seed => identical samples: eval == train (memorization target)
    make_synthetic_dream_dataset(data, "panda", n_images=4, split="test_dr",
                                 seed=0)
    cfgd = dict(
        exp_name="aucreg", urdf_robot_name="panda", batch_size=4,
        epoch_size=4, n_epochs=N_EPOCHS, n_dataloader_workers=2,
        image_size=64.0, lr=1e-3, clip_gradient=5.0,
        use_schedule=True, schedule_type="exponential", n_epochs_warmup=5,
        start_decay=150, end_decay=400, exponent=0.99,
        jitter=False, other_aug=False, occlusion=False, rootnet_flip=False,
        use_rootnet_with_reg_int_shared_backbone=True,
        backbone_name="resnet18", rootnet_backbone_name="resnet18",
        pose_loss_weight=1.0, rot_loss_weight=1.0, trans_loss_weight=1.0,
        uv_loss_weight=1.0, depth_loss_weight=10.0, kp2d_loss_weight=10.0,
        kp3d_loss_weight=10.0, kp2d_int_loss_weight=10.0,
        kp3d_int_loss_weight=10.0, align_3d_loss_weight=0.0,
        reference_keypoint_id=3, fix_root=True, p_dropout=0.0)
    p = base / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfgd))
    cfg = make_cfg(str(p))
    cfg.train_ds_names = str(train_dir)
    return cfg


@pytest.mark.slow
def test_add_auc_crosses_threshold(cfg, tmp_path, monkeypatch):
    """Two assertions with different jobs:

    1. BATCH-STATS eval (train-mode BN, dropout 0) must cross 0.70 — the
       memorization signal through the exact full chain (GT prep, both
       backbones, integral, FK lift, metric grids). A sign/scale bug
       anywhere keeps it near zero.
    2. RUNNING-STATS eval (the real eval path) must cross 0.15 only. This
       64x64/B=4 fixture sits in a small-n BN corner the torch reference
       shares: torch updates running_var with the UNBIASED batch variance
       (models/common.py BatchNorm reproduces it — verified leaf-exact by
       test_train_dynamics_parity), so at the resnet18 last stage
       (2x2 maps, n=16) eval-mode activations shrink by 1/sqrt(16/15) per
       BN, compounding across the stage; measured ceiling ~0.25 here
       (vs ~0.91 with flax's biased update — A/B via
       HOROPOSE_BN_BIASED_RUNNING_VAR=1). Production never sees this:
       at 256^2 the smallest reduction is n = B*8*8 (bessel <= 1.02 even
       at B=4, ~1.0002 at B=64)."""
    monkeypatch.chdir(tmp_path)
    import jax.numpy as jnp
    from collections import defaultdict
    from horopose_tpu.core.engine import (_forward, build_full_eval_step,
                                          build_full_train_step,
                                          make_optimizer, prepare_gt)
    from horopose_tpu.core.loggers import create_logger
    from horopose_tpu.core.metrics import (compute_metrics_batch,
                                           summary_add_pck)
    from horopose_tpu.pipelines.common import get_dataloaders, make_robot
    from horopose_tpu.pipelines.train_full import (build_fullnet,
                                                   init_fullnet_state,
                                                   validate_full)

    _, _, _, writer = create_logger(cfg)
    robot = make_robot(cfg)
    loaders = get_dataloaders(cfg)
    assert "dr" in loaders["test"], list(loaders["test"])
    model = build_fullnet(cfg)
    tx = make_optimizer(cfg, 1)
    state, rng = init_fullnet_state(cfg, model, tx)
    train_step = build_full_train_step(cfg, model, robot, tx)
    eval_step = build_full_eval_step(cfg, model, robot)

    @jax.jit
    def batch_stats_forward(state, batch, rng):
        gts = prepare_gt(cfg, robot, batch, None)
        preds, _, _ = _forward(cfg, model, robot, state.params,
                               state.batch_stats, batch, gts, train=True,
                               dropout_rng=rng)
        return preds, gts

    def batch_stats_auc(state, loader):
        dis = defaultdict(list)
        for batch in loader:
            jb = jax.tree.map(jnp.asarray, batch)
            preds, gts = batch_stats_forward(state, jb, jax.random.PRNGKey(0))
            m = compute_metrics_batch(
                robot=robot,
                gt_keypoints3d=np.asarray(gts["gt_keypoints3d"]),
                gt_keypoints2d=np.asarray(batch["keypoints_2d_original"],
                                          np.float32),
                K_original=np.asarray(batch["K_original"], np.float32),
                gt_joint=np.asarray(gts["gt_pose_before_mask"]),
                pred_keypoints3d=np.asarray(preds["xyz_fk"]),
                pred_joint=np.asarray(preds["pose"]),
                reference_keypoint_id=int(cfg.reference_keypoint_id))
            dis["dis3d"].extend(m["image_dis3d_avg"])
            dis["dis2d"].extend(m["image_dis2d_avg"])
        return summary_add_pck(dis)["ADD/AUC"]

    aucs = {}
    aucs_bs = {}
    for epoch in range(N_EPOCHS + 1):
        if epoch % EVAL_EVERY == 0 and epoch >= 300:
            aucs[epoch] = validate_full(cfg, robot, eval_step, state,
                                        loaders["test"]["dr"], writer,
                                        epoch, "dr", None)
            aucs_bs[epoch] = batch_stats_auc(state, loaders["test"]["dr"])
            if aucs_bs[epoch] >= 0.75 and aucs[epoch] >= 0.20:
                break                     # comfortably past both bars
        for batch in loaders["train"]:
            rng, step_rng = jax.random.split(rng)
            state, logs = train_step(state, batch, step_rng)
        assert np.isfinite(float(logs["loss"])), (epoch, logs)
    else:
        aucs[N_EPOCHS] = validate_full(cfg, robot, eval_step, state,
                                       loaders["test"]["dr"], writer,
                                       N_EPOCHS, "dr", None)
        aucs_bs[N_EPOCHS] = batch_stats_auc(state, loaders["test"]["dr"])
    writer.close()

    # measured ~0.91 batch-stats peak; 0.70 leaves margin for platform
    # jitter while staying far above anything a broken path can reach
    assert max(aucs_bs.values()) >= 0.70, (aucs_bs, aucs)
    # real eval path: bounded by the torch-shared small-n BN eval
    # pathology on this fixture (see docstring); measured peak ~0.25
    assert max(aucs.values()) >= 0.15, (aucs, aucs_bs)
