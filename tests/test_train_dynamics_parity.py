"""Training-dynamics parity ladder vs the reference's own torch code.

Every other numeric-parity test runs eval-mode forwards. This module proves
the TRAINING step agrees too, on the same fabricated DREAM batch and the
same converted weights, against the reference's `farward_loss`
(/root/reference/lib/core/function.py:19-328) run with train=True:

  1. gradient parity     — jax.grad of our 10-loss engine vs torch autograd
                           through the reference model (dropout 0, BN in
                           batch-stats mode both sides);
  2. one-Adam-step parity — torch clip_grad_norm_+Adam (train_full.py:42,
                           61-67) vs our optax chain, post-step params
                           compared over the whole tree;
  3. BN running-stat parity — one train-mode forward, updated
                           running_mean/var compared (settles the torch
                           unbiased-variance / momentum-convention question
                           with a test: models/common.py BatchNorm applies
                           the Bessel correction torch uses).

The reference model's FK is bridged to our kinematics WITH gradient flow
(ref_torch._autograd_bridge applies the jax VJP inside torch autograd), so
the FK-dependent losses (error2d/3d/align) contribute gradients on both
sides; the FK VJP itself is shared (jax autodiff of the oracle-tested FK),
everything else is framework-native.

Gradients are mapped between frameworks by the SAME weight converter used
for forward parity (pure transposes/reindexings, which transform gradients
identically).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import make_synthetic_dream_dataset
from ref_torch import randomize_state_dict, setup_reference_imports

IMG = 256
B = 2
LR = 1e-4
CLIP = 5.0
_WEIGHTS = dict(pose_loss_weight=1.0, rot_loss_weight=1.0,
                trans_loss_weight=1.0, uv_loss_weight=1.0,
                depth_loss_weight=10.0, kp2d_loss_weight=10.0,
                kp3d_loss_weight=10.0, kp2d_int_loss_weight=10.0,
                kp3d_int_loss_weight=10.0, align_3d_loss_weight=1.0)


@pytest.fixture(scope="module")
def dyn(tmp_path_factory):
    """One torch forward/backward/step + one jax forward/grad/step on the
    same batch and weights; tests compare slices of the artifact dict."""
    import torch

    setup_reference_imports()
    import models.backbones.Resnet as ref_resnet
    ref_resnet.ResNet.init_weights = lambda self, name: None
    import os
    scratch = tmp_path_factory.mktemp("refcwd")
    (scratch / "data").mkdir()
    from ref_torch import _stub_module
    _stub_module("lib.utils.BPnP", BPnP_m3d=None, batch_project=None)
    cwd = os.getcwd()
    os.chdir(scratch)
    try:
        import lib.core.config as ref_config
        import lib.core.function as ref_function
        import models.full_net as ref_full
    finally:
        os.chdir(cwd)

    from dataset.const import INITIAL_JOINT_ANGLE
    from ref_torch import BridgeURDFRobot, to_numpy_sd
    from test_numeric_parity_engine import _to_ref_batch
    from horopose_tpu.config import make_default_cfg
    from horopose_tpu.core.engine import (_forward, compute_full_losses,
                                          create_train_state, make_optimizer,
                                          prepare_gt)
    from horopose_tpu.data import DataLoader, DreamDataset
    from horopose_tpu.kinematics import Robot
    from horopose_tpu.pipelines.common import build_fullnet
    from horopose_tpu.tools.torch_weights import (
        convert_fullnet_reference_checkpoint, merge_into)
    import optax

    rng = np.random.RandomState(808)
    d = make_synthetic_dream_dataset(tmp_path_factory.mktemp("ds"), "panda",
                                     n_images=B, split="train_dr", seed=31)
    ds = DreamDataset(d, color_jitter=False, rgb_augmentation=False,
                      occlusion_augmentation=False,
                      rootnet_resize_hw=(IMG, IMG),
                      other_resize_hw=(IMG, IMG))
    loader = DataLoader(ds, batch_size=B, num_workers=0, drop_last=False)
    np_batch = next(iter(loader))
    loader.close()

    # --- reference side ---
    args = ref_config.make_default_cfg()
    args.urdf_robot_name = "panda"
    args.train_ds_names = str(d)            # contains "synth": no BPnP
    args.backbone_name = "resnet34"
    args.rootnet_backbone_name = "resnet34"
    args.image_size = float(IMG)
    args.other_image_size = float(IMG)
    args.rootnet_image_size = float(IMG)
    args.use_origin_bbox = False
    args.use_extended_bbox = True
    args.reference_keypoint_id = 3
    args.fix_root = True
    args.p_dropout = 0.0                    # dropout off: deterministic grads
    for k, v in _WEIGHTS.items():
        args[k] = v

    init_param_dict = {
        "robot_type": "panda",
        "pose_params": INITIAL_JOINT_ANGLE,
        "cam_params": np.eye(4, dtype=float),
        "init_pose_from_mean": True,
    }
    tmodel = ref_full.RootNetwithRegInt(init_param_dict, args)
    tmodel.load_state_dict(randomize_state_dict(tmodel.state_dict(), rng))
    # snapshot BEFORE the train-mode forward: it mutates BN running stats
    # in place, and to_numpy_sd shares tensor storage
    pre_sd = {k: v.copy() for k, v in to_numpy_sd(tmodel).items()}

    robot_bridge = BridgeURDFRobot("panda")
    ref_batch = _to_ref_batch(np_batch, "panda")
    t_opt = torch.optim.Adam(tmodel.parameters(), lr=LR)
    t_opt.zero_grad()
    # farward_loss returns (loss, loss_dict) when train=True
    # (function.py:324-327)
    t_loss, t_loss_dict = ref_function.farward_loss(
        args, ref_batch, tmodel, robot_bridge, torch.device("cpu"),
        [0], train=True)
    # BN running stats updated by the forward; copy before the step
    post_fwd_sd = {k: v.copy() for k, v in to_numpy_sd(tmodel).items()}
    t_loss.backward()
    t_grads = {}
    for k, v in tmodel.named_parameters():
        t_grads[k] = (v.grad.detach().cpu().numpy().copy()
                      if v.grad is not None
                      else np.zeros(tuple(v.shape), np.float32))
    torch.nn.utils.clip_grad_norm_(tmodel.parameters(), CLIP)
    t_opt.step()
    post_step_sd = {k: v.copy() for k, v in to_numpy_sd(tmodel).items()}

    # --- our side: same weights through the converter, same batch ---
    cfg = make_default_cfg()
    cfg.urdf_robot_name = "panda"
    cfg.train_ds_names = str(d)
    cfg.backbone_name = "resnet34"
    cfg.rootnet_backbone_name = "resnet34"
    cfg.image_size = float(IMG)
    cfg.use_origin_bbox = False
    cfg.use_extended_bbox = True
    cfg.reference_keypoint_id = 3
    cfg.fix_root = True
    cfg.p_dropout = 0.0
    cfg.lr = LR
    cfg.clip_gradient = CLIP
    cfg.use_schedule = False
    for k, v in _WEIGHTS.items():
        cfg[k] = v

    model = build_fullnet(cfg)
    robot = Robot("panda")
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key},
                           jnp.zeros((1, IMG, IMG, 3)),
                           jnp.zeros((1, IMG, IMG, 3)), jnp.ones((1,)),
                           jnp.eye(3)[None], train=False)
    variables = merge_into(variables, convert_fullnet_reference_checkpoint(
        pre_sd, "resnet34", "resnet34"))
    tx = make_optimizer(cfg, 1)
    state = create_train_state(variables, tx)

    j_batch = jax.tree.map(jnp.asarray, np_batch)
    gts = prepare_gt(cfg, robot, j_batch, None)

    def loss_fn(params):
        preds, new_bs, other_K = _forward(
            cfg, model, robot, params, state.batch_stats, j_batch, gts,
            train=True, dropout_rng=key)
        loss, loss_dict = compute_full_losses(cfg, preds, gts, other_K)
        return loss, (loss_dict, new_bs)

    (j_loss, (j_loss_dict, j_new_bs)), j_grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, _ = tx.update(j_grads, state.opt_state, state.params)
    j_new_params = optax.apply_updates(state.params, updates)

    def convert(sd):
        return convert_fullnet_reference_checkpoint(sd, "resnet34",
                                                    "resnet34")

    return dict(
        t_loss=float(t_loss),
        t_loss_dict={k: float(v) for k, v in t_loss_dict.items()},
        t_grads=t_grads, pre_sd=pre_sd, post_fwd_sd=post_fwd_sd,
        post_step_sd=post_step_sd,
        j_loss=float(j_loss),
        j_loss_dict={k: float(v) for k, v in j_loss_dict.items()},
        j_grads=j_grads, j_new_bs=j_new_bs, j_new_params=j_new_params,
        state=state, convert=convert, cfg=cfg,
    )


def _ref_tree_from_sd(convert, sd, template):
    """torch flat sd -> flax-shaped tree via the forward-parity converter,
    merged over a NaN template so uncovered leaves are loudly visible.
    Converter subtrees absent from the template (e.g. batch_stats when only
    params are compared) are dropped."""
    from horopose_tpu.tools.torch_weights import merge_into
    nan_tmpl = jax.tree.map(
        lambda x: jnp.full(jnp.shape(x), jnp.nan, jnp.float32), template)
    tb = convert(sd)
    if "params" not in template:
        tb.params = {}
    if "batch_stats" not in template:
        tb.batch_stats = {}
    return merge_into(nan_tmpl, tb)


def _compare_trees(ours, ref, rel_tol, abs_floor, what):
    """Leaf-wise |a-b|.max() <= rel_tol * leaf_scale + abs_floor, with the
    global max-|ref| as the scale floor so near-zero leaves are judged
    against the tree's magnitude, not their own."""
    o_leaves = jax.tree_util.tree_flatten_with_path(ours)[0]
    r_leaves = jax.tree_util.tree_flatten_with_path(ref)[0]
    assert len(o_leaves) == len(r_leaves)
    gscale = max(float(jnp.abs(x).max())
                 for _, x in r_leaves if jnp.size(x)) or 1.0
    bad = []
    for (po, a), (pr, b) in zip(o_leaves, r_leaves):
        assert po == pr
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        assert np.isfinite(b).all(), \
            f"{what}: converter left NaNs at {jax.tree_util.keystr(po)}"
        scale = max(np.abs(b).max(), 1e-3 * gscale)
        err = np.abs(a - b).max()
        if err > rel_tol * scale + abs_floor:
            bad.append(f"{jax.tree_util.keystr(po)}: max|Δ|={err:.3e} "
                       f"scale={scale:.3e} rel={err / scale:.3e}")
    assert not bad, f"{what}: {len(bad)} leaves disagree:\n" + \
        "\n".join(bad[:12])


def test_gradient_parity(dyn):
    """Per-leaf tolerance note: gradients of conv kernels THROUGH a
    train-mode BatchNorm are cancellation-dominated — BN normalizes away
    the conv output's scale/shift, so the true gradient is the tiny
    nonlinear residue of near-cancelling terms. Verified against central
    finite differences on the torch loss: torch autograd == FD == jax
    full-diff within that residue, but two fp32 implementations of the
    near-cancelling sums legitimately differ by a few % of the leaf max
    (deterministically — the error pattern changes with the variance
    algorithm, not across runs). Hence rel_tol 5e-2 per leaf plus a global
    cosine-similarity bound, which a semantic mismatch (e.g. stop-gradient
    through batch stats: rel ~2e5 in the FD experiment) fails by orders of
    magnitude."""
    # the losses themselves must agree in TRAIN mode too (BN batch stats)
    t_all = dict(dyn["t_loss_dict"], loss=dyn["t_loss"])
    for name, tv in sorted(t_all.items()):
        ov = dyn["j_loss_dict"].get(name, dyn["j_loss"] if name == "loss"
                                    else None)
        assert ov is not None, name
        assert abs(ov - tv) / max(abs(tv), 1e-3) < 1e-3, \
            f"train-mode {name}: ref {tv} vs ours {ov}"
    # gradient state-dict -> flax layout through the same converter; BN
    # buffer slots are zero-filled (no grads) and excluded via params-only
    grad_sd = {k: np.zeros_like(v) for k, v in dyn["pre_sd"].items()}
    grad_sd.update(dyn["t_grads"])
    ref_tree = _ref_tree_from_sd(dyn["convert"], grad_sd,
                                 {"params": dyn["state"].params})
    # per-leaf: l2-relative (aggregate, tail-insensitive) tight at 5e-2,
    # entrywise max loose at 0.3 for the few cancellation-tail entries
    o_leaves = jax.tree_util.tree_flatten_with_path(dyn["j_grads"])[0]
    r_leaves = jax.tree_util.tree_flatten_with_path(ref_tree["params"])[0]
    gnorm = max(float(jnp.linalg.norm(x.ravel())) for _, x in r_leaves)
    gscale = max(float(jnp.abs(x).max()) for _, x in r_leaves)
    bad = []
    for (po, a), (pr, b) in zip(o_leaves, r_leaves):
        assert po == pr
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        assert np.isfinite(b).all(), jax.tree_util.keystr(po)
        l2 = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-3 * gnorm)
        mx = np.abs(a - b).max() / max(np.abs(b).max(), 1e-3 * gscale)
        if l2 > 5e-2 or mx > 0.3:
            bad.append(f"{jax.tree_util.keystr(po)}: l2rel={l2:.3e} "
                       f"maxrel={mx:.3e}")
    assert not bad, f"gradients: {len(bad)} leaves disagree:\n" + \
        "\n".join(bad[:12])
    ours_flat = np.concatenate([np.asarray(x, np.float64).ravel()
                                for x in jax.tree.leaves(dyn["j_grads"])])
    ref_flat = np.concatenate([np.asarray(x, np.float64).ravel()
                               for x in jax.tree.leaves(ref_tree["params"])])
    cos = float(ours_flat @ ref_flat /
                (np.linalg.norm(ours_flat) * np.linalg.norm(ref_flat)))
    assert cos > 0.9999, f"global gradient cosine {cos}"


def test_one_adam_step_parity(dyn):
    """Optimizer-semantics parity in isolation: apply OUR optax chain
    (clip_by_global_norm + adam, engine.make_optimizer) to the TORCH
    gradients, and compare the post-step params against torch's
    clip_grad_norm_+Adam step on those same gradients. Feeding identical
    gradients removes the noise-amplified sign flips Adam produces on
    near-zero gradient entries (m_hat/(sqrt(v_hat))+eps is +-1-valued at
    step 1), so the bound can be tight: any betas/eps/bias-correction/
    clip-placement/L2-coupling mismatch would blow it up by ~lr."""
    import optax
    from horopose_tpu.core.engine import make_optimizer

    grad_sd = {k: np.zeros_like(v) for k, v in dyn["pre_sd"].items()}
    grad_sd.update(dyn["t_grads"])
    ref_grads = _ref_tree_from_sd(dyn["convert"], grad_sd,
                                  {"params": dyn["state"].params})["params"]
    tx = make_optimizer(dyn["cfg"], 1)
    state = dyn["state"]
    updates, _ = tx.update(ref_grads, tx.init(state.params), state.params)
    ours_post = optax.apply_updates(state.params, updates)

    ref_tree = _ref_tree_from_sd(dyn["convert"], dyn["post_step_sd"],
                                 {"params": dyn["state"].params})
    pre_tree = _ref_tree_from_sd(dyn["convert"], dyn["pre_sd"],
                                 {"params": dyn["state"].params})
    # judge the DELTA against lr-scale — comparing raw params would hide
    # the step entirely
    ours_delta = jax.tree.map(lambda a, b: a - b, ours_post,
                              pre_tree["params"])
    ref_delta = jax.tree.map(lambda a, b: a - b, ref_tree["params"],
                             pre_tree["params"])
    # deltas are ~lr-sized fp32 values: allow a few ulp (observed worst
    # 3e-8 absolute on identical-gradient inputs)
    _compare_trees(ours_delta, ref_delta, rel_tol=5e-4, abs_floor=LR * 1e-3,
                   what="adam-step deltas")


def test_bn_running_stats_parity(dyn):
    ref_tree = _ref_tree_from_sd(dyn["convert"], dyn["post_fwd_sd"],
                                 {"batch_stats": dyn["state"].batch_stats})
    _compare_trees(dyn["j_new_bs"], ref_tree["batch_stats"],
                   rel_tol=1e-4, abs_floor=1e-7, what="bn running stats")
