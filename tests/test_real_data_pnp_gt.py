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
    pnp_fn = make_pnp_fn(cfg)
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
    assert make_pnp_fn(cfg) is None
