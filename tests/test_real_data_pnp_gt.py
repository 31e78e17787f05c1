"""Real-dataset path: PnP pseudo-GT rotation must agree with the annotated
TCO rotation on a clean (noise-free) fixture — validating the
function.py:67-75 replacement end-to-end through prepare_gt."""

import jax.numpy as jnp
import numpy as np

from fixtures import make_synthetic_dream_dataset
from horopose_tpu.config import make_default_cfg
from horopose_tpu.core.engine import prepare_gt
from horopose_tpu.data import DataLoader, DreamDataset
from horopose_tpu.kinematics import Robot
from horopose_tpu.ops.rotations import geodesic_distance, rot6d_to_rotmat
from horopose_tpu.pipelines.common import make_pnp_fn


def test_pnp_pseudo_gt_matches_tco(tmp_path):
    d = make_synthetic_dream_dataset(tmp_path, "panda", n_images=4,
                                     synthetic=False, split="azure", seed=11)
    ds = DreamDataset(d, color_jitter=False, rgb_augmentation=False,
                      occlusion_augmentation=False)
    assert ds.scale == 1.0  # real sets are metric already
    loader = DataLoader(ds, batch_size=4, num_workers=2, drop_last=False)
    batch = next(iter(loader))
    batch = {k: ({kk: jnp.asarray(vv) for kk, vv in v.items()}
                 if isinstance(v, dict) else jnp.asarray(v))
             for k, v in batch.items()}

    cfg = make_default_cfg()
    cfg.train_ds_names = str(d)       # no "synth" -> real path
    cfg.reference_keypoint_id = 3
    robot = Robot("panda")
    pnp_fn = make_pnp_fn(cfg.train_ds_names)
    assert pnp_fn is not None

    gts_pnp = prepare_gt(cfg, robot, batch, pnp_fn)
    gts_tco = prepare_gt(cfg, robot, batch, None)

    R_pnp = rot6d_to_rotmat(gts_pnp["gt_root_rot"])
    R_tco = rot6d_to_rotmat(gts_tco["gt_root_rot"])
    ang = np.asarray(geodesic_distance(R_pnp, R_tco))
    # clean projections -> PnP should land within a fraction of a degree
    np.testing.assert_array_less(ang, np.deg2rad(0.5))


def test_synth_path_skips_pnp(tmp_path):
    d = make_synthetic_dream_dataset(tmp_path / "s", "panda", n_images=2,
                                     split="train_dr", seed=12)
    cfg = make_default_cfg()
    cfg.train_ds_names = str(d)
    assert make_pnp_fn(cfg.train_ds_names) is None
    # the test harness keys on the set under evaluation, not the train set
    # (/root/reference/scripts/test.py:120-125)
    assert make_pnp_fn("panda-3cam_realsense") is not None
    assert make_pnp_fn("panda_synth_test_photo") is None


def _run_eval(base, test_dir, exp_name):
    import os
    import yaml
    from horopose_tpu.pipelines.test import make_test_cfg, test_network
    exp_path = os.path.join(str(base), "experiments", exp_name)
    os.makedirs(os.path.join(exp_path, "ckpt"), exist_ok=True)
    with open(os.path.join(exp_path, "config.yaml"), "w") as f:
        yaml.safe_dump(dict(
            exp_name=exp_name, urdf_robot_name="panda", image_size=64.0,
            backbone_name="resnet18", rootnet_backbone_name="resnet18",
            reference_keypoint_id=3, fix_root=True), f)
    cfg = make_test_cfg(exp_path, str(test_dir))
    test_network(cfg, ckpt_name="absent.pk", batch_size=4)
    txt = open(os.path.join(exp_path, "result", "summary.txt")).read()
    line = next(ln for ln in txt.splitlines()
                if ln.startswith("Rotation_l1_error"))
    return float(line.split(":")[1])


def test_eval_harness_scores_rotation_against_pnp_pseudo_gt(tmp_path):
    """Reference parity on real sets (/root/reference/scripts/test.py:120-125):
    the annotated TCO rotation must be IGNORED by the test harness — the
    rotation metric scores against PnP of the annotated 2D keypoints + FK
    points. Proven by perturbing only the annotation quaternions of an
    otherwise-identical real-split fixture: every reported metric, rotation
    included, must be unchanged (random-init model, fixed seed)."""
    import json as _json
    import shutil
    d = make_synthetic_dream_dataset(tmp_path, "panda", n_images=4,
                                     synthetic=False, split="azure", seed=21)
    d2 = tmp_path / "perturbed" / "real" / "panda-3cam_azure"
    shutil.copytree(d, d2)
    rs = np.random.RandomState(3)
    n_rot = 0
    for jp in sorted(d2.glob("*.json")):
        if jp.name.startswith("_"):
            continue
        ann = _json.loads(jp.read_text())
        q = np.asarray(ann["objects"][0]["quaternion_xyzw"], np.float64)
        q = q + rs.uniform(-0.2, 0.2, 4)
        ann["objects"][0]["quaternion_xyzw"] = (q / np.linalg.norm(q)).tolist()
        jp.write_text(_json.dumps(ann))
        n_rot += 1
    assert n_rot == 4

    rot_a = _run_eval(tmp_path / "A", d, "pnp_gt_a")
    rot_b = _run_eval(tmp_path / "B", d2, "pnp_gt_b")
    assert np.isfinite(rot_a)
    assert abs(rot_a - rot_b) < 1e-6, (
        "rotation metric moved with the annotated TCO: real-set eval is "
        f"scoring against TCO instead of PnP pseudo-GT ({rot_a} vs {rot_b})")
