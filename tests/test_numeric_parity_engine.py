"""END-TO-END loss-engine parity: the reference's own `farward_loss`
(/root/reference/lib/core/function.py:19-328 — GT preparation incl.
rotation-at-root reframing, k-value computation, joint masking, the model
forward, and the 10-loss battery) vs our jitted eval step
(core/engine.py: prepare_gt + forward + compute_full_losses), on the SAME
fabricated DREAM batch and the SAME converted weights.

This composes every parity axis into one number: if the total loss and all
ten loss_dict entries agree, the GT semantics, the k-value/bbox rules, the
model forward, the reprojection, and the loss formulas all agree. The
reference model's FK is bridged to our kinematics (ref_torch docstring) —
FK itself is oracle-tested in test_fk.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fixtures import make_synthetic_dream_dataset
from ref_torch import (randomize_state_dict, setup_reference_imports,
                       to_numpy_sd)

IMG = 256
B = 4
_WEIGHTS = dict(pose_loss_weight=1.0, rot_loss_weight=1.0,
                trans_loss_weight=1.0, uv_loss_weight=1.0,
                depth_loss_weight=10.0, kp2d_loss_weight=10.0,
                kp3d_loss_weight=10.0, kp2d_int_loss_weight=10.0,
                kp3d_int_loss_weight=10.0, align_3d_loss_weight=1.0)


@pytest.fixture(scope="module")
def ref_engine(tmp_path_factory):
    setup_reference_imports()
    import models.backbones.Resnet as ref_resnet
    ref_resnet.ResNet.init_weights = lambda self, name: None
    # lib/config.py asserts Path('data').exists() in CWD and roots a joblib
    # cache there — import from a scratch dir so nothing touches the
    # (read-only) reference tree
    import os
    scratch = tmp_path_factory.mktemp("refcwd")
    (scratch / "data").mkdir()
    # BPnP.py builds a CUDA tensor at MODULE level (BPnP.py:2, a
    # lazy-wrapper workaround) — impossible on CPU-only torch. The synth
    # path under test never calls BPnP (function.py:67 keys on
    # "synth" in train_ds_names), so stub the import surface.
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
    return ref_config, ref_function, ref_full


def _to_ref_batch(batch, robot_type):
    """Our collated numpy batch -> the reference loader's dict format:
    images NCHW tensors, jointpose as {joint_name: tensor(B)}
    (dream.py:???: the reference collates the per-joint dict)."""
    import torch
    from dataset.const import JOINT_NAMES

    def t(x):
        return torch.from_numpy(np.asarray(x))

    def crop(d):
        return {
            "images": t(d["images"]).permute(0, 3, 1, 2).contiguous(),
            "K": t(d["K"]),
            "keypoints_3d": t(d["keypoints_3d"]),
            "keypoints_2d": t(d["keypoints_2d"]),
            "valid_mask_crop": t(d["valid_mask_crop"]),
            "bbox_strict_bounded": t(d["bbox_strict_bounded"]),
            "bbox_gt2d_extended": t(d["bbox_gt2d_extended"]),
        }
    jp = np.asarray(batch["jointpose"], np.float32)
    return {
        "TCO": t(batch["TCO"]),
        "K_original": t(batch["K_original"]),
        "jointpose": {name: t(jp[:, i])
                      for i, name in enumerate(JOINT_NAMES[robot_type])},
        "keypoints_2d_original": t(batch["keypoints_2d_original"]),
        "valid_mask": t(batch["valid_mask"]),
        "bbox_strict_bounded_original": t(
            batch["bbox_strict_bounded_original"]),
        "root": crop(batch["root"]),
        "other": crop(batch["other"]),
    }


def test_full_engine_loss_parity_real_pnp_branch(ref_engine, rng, tmp_path):
    """END-TO-END parity of the REAL-dataset branch: train_ds_names without
    'synth' makes the reference compute pseudo-GT rotation via the REAL
    lib.utils.BPnP (cv2.solvePnP EPNP+ITERATIVE, BPnP.py:129-151) inside
    farward_loss (function.py:67-75), vs our eval step with ops/pnp.py as
    pnp_fn. On the clean fixture the two solvers agree to ~2e-4 rad
    (scripts/measure_pnp_cv2.py), so every loss must match to 2e-3."""
    import torch
    from horopose_tpu.config import make_default_cfg
    from horopose_tpu.core.engine import (build_full_eval_step,
                                          create_train_state, make_optimizer)
    from horopose_tpu.data import DataLoader, DreamDataset
    from horopose_tpu.kinematics import Robot
    from horopose_tpu.pipelines.common import build_fullnet, make_pnp_fn
    from horopose_tpu.tools.torch_weights import (
        convert_fullnet_reference_checkpoint, merge_into)
    from dataset.const import INITIAL_JOINT_ANGLE
    from ref_torch import BridgeURDFRobot, import_reference_bpnp, to_numpy_sd

    ref_config, ref_function, ref_full = ref_engine
    bpnp_mod = import_reference_bpnp()
    assert bpnp_mod.BPnP_m3d is not None
    # function.py:9 binds the name at import time; swap the stub for real
    old_bpnp = ref_function.BPnP_m3d
    ref_function.BPnP_m3d = bpnp_mod.BPnP_m3d
    try:
        d = make_synthetic_dream_dataset(tmp_path, "panda", n_images=B,
                                         synthetic=False, split="azure",
                                         seed=77)
        ds = DreamDataset(d, color_jitter=False, rgb_augmentation=False,
                          occlusion_augmentation=False,
                          rootnet_resize_hw=(IMG, IMG),
                          other_resize_hw=(IMG, IMG))
        loader = DataLoader(ds, batch_size=B, num_workers=2, drop_last=False)
        np_batch = next(iter(loader))
        loader.close()

        args = ref_config.make_default_cfg()
        args.urdf_robot_name = "panda"
        args.train_ds_names = str(d)        # NO 'synth': real BPnP branch
        assert "synth" not in str(d)
        args.backbone_name = "resnet34"
        args.rootnet_backbone_name = "resnet34"
        args.image_size = float(IMG)
        args.other_image_size = float(IMG)
        args.rootnet_image_size = float(IMG)
        args.use_origin_bbox = False
        args.use_extended_bbox = True
        args.reference_keypoint_id = 3
        args.fix_root = True
        for k, v in _WEIGHTS.items():
            args[k] = v

        init_param_dict = {
            "robot_type": "panda",
            "pose_params": INITIAL_JOINT_ANGLE,
            "cam_params": np.eye(4, dtype=float),
            "init_pose_from_mean": True,
        }
        tmodel = ref_full.RootNetwithRegInt(init_param_dict, args)
        tmodel.load_state_dict(randomize_state_dict(tmodel.state_dict(),
                                                    rng))
        robot_bridge = BridgeURDFRobot("panda")
        ref_batch = _to_ref_batch(np_batch, "panda")
        with torch.no_grad():
            t_loss, t_loss_dict, t_metrics = ref_function.farward_loss(
                args, ref_batch, tmodel, robot_bridge, torch.device("cpu"),
                [0], train=False)
    finally:
        ref_function.BPnP_m3d = old_bpnp

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
        to_numpy_sd(tmodel), "resnet34", "resnet34"))
    state = create_train_state(variables, make_optimizer(cfg, 1))
    pnp_fn = make_pnp_fn(cfg.train_ds_names)
    assert pnp_fn is not None  # real path engaged
    eval_step = build_full_eval_step(cfg, model, robot, pnp_fn=pnp_fn)
    j_batch = jax.tree.map(jnp.asarray, np_batch)
    _, _, logs = eval_step(state, j_batch)

    t_all = {k: float(v) for k, v in t_loss_dict.items()}
    t_all["loss"] = float(t_loss)
    t_all["rotation_diff"] = float(t_metrics["rotation_diff"])
    mismatches = []
    for name, tv in sorted(t_all.items()):
        ov = float(logs[name])
        denom = max(abs(tv), 1e-3)
        if abs(ov - tv) / denom > 2e-3:
            mismatches.append(f"{name}: ref {tv:.6f} vs ours {ov:.6f}")
    assert not mismatches, "; ".join(mismatches)
    print("[engine parity real-pnp] loss =", t_all["loss"])


@pytest.mark.parametrize("use_origin,use_extended", [
    (False, True),    # flagship (full.yaml: use_extended_bbox True)
    (False, False),   # k-values from root.K + strict-bounded crop bbox
    (True, False),    # k-values from K_original + original strict bbox
])
def test_full_engine_loss_parity(ref_engine, rng, tmp_path, use_origin,
                                 use_extended):
    import torch
    from horopose_tpu.config import make_default_cfg
    from horopose_tpu.core.engine import (build_full_eval_step,
                                          create_train_state, make_optimizer)
    from horopose_tpu.data import DataLoader, DreamDataset
    from horopose_tpu.kinematics import Robot
    from horopose_tpu.pipelines.common import build_fullnet
    from horopose_tpu.tools.torch_weights import (
        convert_fullnet_reference_checkpoint, merge_into)
    from dataset.const import INITIAL_JOINT_ANGLE
    from ref_torch import BridgeURDFRobot

    ref_config, ref_function, ref_full = ref_engine

    # --- one real fixture batch through OUR loader ---
    d = make_synthetic_dream_dataset(tmp_path, "panda", n_images=B,
                                     split="train_dr", seed=31)
    ds = DreamDataset(d, color_jitter=False, rgb_augmentation=False,
                      occlusion_augmentation=False,
                      rootnet_resize_hw=(IMG, IMG),
                      other_resize_hw=(IMG, IMG))
    loader = DataLoader(ds, batch_size=B, num_workers=2, drop_last=False)
    np_batch = next(iter(loader))
    loader.close()

    # --- reference side: args from ITS OWN config defaults ---
    args = ref_config.make_default_cfg()
    args.urdf_robot_name = "panda"
    args.train_ds_names = str(d)            # contains "synth": no BPnP
    args.backbone_name = "resnet34"
    args.rootnet_backbone_name = "resnet34"
    args.image_size = float(IMG)
    args.other_image_size = float(IMG)
    args.rootnet_image_size = float(IMG)
    args.use_origin_bbox = use_origin
    args.use_extended_bbox = use_extended
    args.reference_keypoint_id = 3
    args.fix_root = True
    # configs/panda/full.yaml weights (defaults are all 0.0); align_3d
    # bumped to 1.0 so that term is exercised too
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

    robot_bridge = BridgeURDFRobot("panda")
    ref_batch = _to_ref_batch(np_batch, "panda")
    with torch.no_grad():
        t_loss, t_loss_dict, t_metrics = ref_function.farward_loss(
            args, ref_batch, tmodel, robot_bridge, torch.device("cpu"),
            [0], train=False)

    # --- our side: same weights through the converter, same batch ---
    cfg = make_default_cfg()
    cfg.urdf_robot_name = "panda"
    cfg.train_ds_names = str(d)
    cfg.backbone_name = "resnet34"
    cfg.rootnet_backbone_name = "resnet34"
    cfg.image_size = float(IMG)
    cfg.use_origin_bbox = use_origin
    cfg.use_extended_bbox = use_extended
    cfg.reference_keypoint_id = 3
    cfg.fix_root = True
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
        to_numpy_sd(tmodel), "resnet34", "resnet34"))
    state = create_train_state(variables, make_optimizer(cfg, 1))
    eval_step = build_full_eval_step(cfg, model, robot)
    j_batch = jax.tree.map(jnp.asarray, np_batch)
    _, _, logs = eval_step(state, j_batch)

    # --- the ten losses + the weighted total must agree ---
    t_all = {k: float(v) for k, v in t_loss_dict.items()}
    t_all["loss"] = float(t_loss)
    t_all["rotation_diff"] = float(t_metrics["rotation_diff"])
    mismatches = []
    for name, tv in sorted(t_all.items()):
        ov = float(logs[name])
        denom = max(abs(tv), 1e-3)
        if abs(ov - tv) / denom > 5e-4:
            mismatches.append(f"{name}: ref {tv:.6f} vs ours {ov:.6f}")
    assert not mismatches, "; ".join(mismatches)
    print("[engine parity] loss =", t_all["loss"])
