"""Data pipeline tests against the fabricated DREAM fixture."""

import numpy as np
import pytest

from horopose_tpu.data import DataLoader, DreamDataset, PartialSampler
from horopose_tpu.data.samplers import pad_batch

from fixtures import make_synthetic_dream_dataset


@pytest.fixture(scope="module")
def dream_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("dream")
    return make_synthetic_dream_dataset(base, "panda", n_images=6)


def test_dataset_reads_and_shapes(dream_dir):
    ds = DreamDataset(dream_dir, color_jitter=False, rgb_augmentation=False,
                      occlusion_augmentation=False)
    assert len(ds) == 6
    assert ds.scale == 0.01
    s = ds[0]
    assert s["root"]["images"].shape == (256, 256, 3)
    assert s["other"]["images"].shape == (256, 256, 3)
    assert s["jointpose"].shape == (8,)
    assert s["TCO"].shape == (4, 4)
    assert s["keypoints_3d_original"].shape == (7, 3)
    assert s["valid_mask"].shape == (7,)


def test_crop_keypoints_project_consistently(dream_dir):
    """Reprojecting the 3D keypoints with the crop K must land on the
    keypoints_2d stored for the crop (they are computed that way), and those
    must fall inside the crop for a robot well inside the frame."""
    ds = DreamDataset(dream_dir, color_jitter=False, rgb_augmentation=False,
                      occlusion_augmentation=False)
    s = ds[1]
    K = s["other"]["K"]
    kp3 = s["other"]["keypoints_3d"]
    proj = (K @ kp3.T).T
    proj = proj[:, :2] / proj[:, 2:3]
    np.testing.assert_allclose(proj, s["other"]["keypoints_2d"], atol=1e-3)


def test_tco_matches_fk_keypoints(dream_dir):
    """TCO @ FK(joints) must reproduce the annotated 3D keypoints — the
    ground-truth chain the losses rely on (dream.py's TWO decode + our FK)."""
    import jax.numpy as jnp
    from horopose_tpu.kinematics import Robot
    ds = DreamDataset(dream_dir, color_jitter=False, rgb_augmentation=False,
                      occlusion_augmentation=False)
    robot = Robot("panda")
    s = ds[2]
    kp_base = np.asarray(robot.get_keypoints_only_fk(
        jnp.asarray(s["jointpose"])[None]))[0]
    R, t = s["TCO"][:3, :3], s["TCO"][:3, 3]
    kp_cam = (R @ kp_base.T).T + t
    np.testing.assert_allclose(kp_cam, s["keypoints_3d_original"], atol=1e-4)


def test_augmentations_dont_change_annotations(dream_dir):
    ds_plain = DreamDataset(dream_dir, color_jitter=False,
                            rgb_augmentation=False,
                            occlusion_augmentation=False)
    ds_aug = DreamDataset(dream_dir, color_jitter=True, rgb_augmentation=True,
                          occlusion_augmentation=True, occlu_p=1.0)
    a, b = ds_plain[0], ds_aug[0]
    np.testing.assert_allclose(a["TCO"], b["TCO"])
    np.testing.assert_allclose(a["other"]["keypoints_2d"],
                               b["other"]["keypoints_2d"], atol=1e-5)
    # images should differ (occlusion p=1)
    assert (a["other"]["images"] != b["other"]["images"]).any()


def test_dataloader_batches(dream_dir):
    ds = DreamDataset(dream_dir, color_jitter=False, rgb_augmentation=False,
                      occlusion_augmentation=False)
    loader = DataLoader(ds, batch_size=4, sampler=PartialSampler(ds, None),
                        num_workers=2, drop_last=True)
    batches = list(loader)
    assert len(batches) == 1  # 6 // 4
    b = batches[0]
    assert b["root"]["images"].shape == (4, 256, 256, 3)
    assert b["jointpose"].shape == (4, 8)
    assert b["other"]["K"].shape == (4, 3, 3)


def test_dataloader_no_drop_and_pad(dream_dir):
    ds = DreamDataset(dream_dir, color_jitter=False, rgb_augmentation=False,
                      occlusion_augmentation=False)
    loader = DataLoader(ds, batch_size=4, num_workers=2, drop_last=False)
    batches = list(loader)
    assert len(batches) == 2
    padded, n_valid = pad_batch(batches[-1], 4)
    assert n_valid == 2
    assert padded["root"]["images"].shape[0] == 4


def test_partial_sampler_subsets():
    class FakeDS:
        def __len__(self):
            return 100
    s = PartialSampler(FakeDS(), 10)
    idx = list(iter(s))
    assert len(idx) == 10
    assert len(set(idx)) == 10


def test_dataloader_process_workers(dream_dir):
    """Process pool mode must produce identical-structure batches."""
    ds = DreamDataset(dream_dir, color_jitter=False, rgb_augmentation=False,
                      occlusion_augmentation=False)
    loader = DataLoader(ds, batch_size=4, num_workers=2, drop_last=True,
                        use_processes=True)
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0]["root"]["images"].shape == (4, 256, 256, 3)
    # second epoch reuses the persistent pool
    batches2 = list(loader)
    np.testing.assert_allclose(batches2[0]["TCO"], batches[0]["TCO"])


def test_padding_zoom_out(dream_dir):
    """padding=True: border pad + re-resize keeps the projection chain
    consistent and shrinks the robot's 2D footprint."""
    ds_plain = DreamDataset(dream_dir, color_jitter=False,
                            rgb_augmentation=False,
                            occlusion_augmentation=False)
    ds_pad = DreamDataset(dream_dir, color_jitter=False,
                          rgb_augmentation=False,
                          occlusion_augmentation=False, padding=True)
    a, b = ds_plain[0], ds_pad[0]
    K = b["other"]["K"]
    kp3 = b["other"]["keypoints_3d"]
    proj = (K @ kp3.T).T
    proj = proj[:, :2] / proj[:, 2:3]
    np.testing.assert_allclose(proj, b["other"]["keypoints_2d"], atol=1e-2)
    span = lambda s: np.ptp(s["other"]["keypoints_2d"], axis=0).max()
    assert span(b) < span(a)  # zoomed out


def test_process_workers_have_distinct_rng_streams():
    """Fork copies the parent's RNG state: without per-worker reseeding all
    workers draw identical augmentation streams. Probe each worker's first
    draws and require them distinct across workers."""
    import multiprocessing as mp
    from collections import defaultdict
    from horopose_tpu.data.samplers import _proc_init, _worker_rng_probe

    ctx = mp.get_context("fork")
    counter = ctx.Value("i", 0)
    with ctx.Pool(2, initializer=_proc_init,
                  initargs=(None, counter, 808)) as pool:
        results = pool.map(_worker_rng_probe, range(8), chunksize=1)
    by_pid = defaultdict(list)
    for pid, r, nr in results:
        by_pid[pid].append((r, nr))
    assert len(by_pid) == 2, "expected both workers to run probes"
    firsts = [draws[0] for draws in by_pid.values()]
    assert firsts[0] != firsts[1], firsts


def test_dataloader_forkserver_workers(tmp_path):
    """The forkserver start method (no fork-from-multithreaded hazard)
    works end to end: the dataset (incl. the path-pickled decode cache)
    ships to clean worker processes."""
    from fixtures import make_synthetic_dream_dataset
    from horopose_tpu.data import DataLoader, DreamDataset

    d = make_synthetic_dream_dataset(tmp_path / "dream", "panda",
                                     n_images=4, split="train_dr", seed=9)
    ds = DreamDataset(d, color_jitter=False, rgb_augmentation=False,
                      occlusion_augmentation=False,
                      rootnet_resize_hw=(64, 64), other_resize_hw=(64, 64),
                      decode_cache_dir=tmp_path / "cache")
    loader = DataLoader(ds, batch_size=2, num_workers=2, drop_last=False,
                        use_processes=True, start_method="forkserver")
    n = 0
    for batch in loader:
        n += batch["TCO"].shape[0]
    loader.close()
    assert n == 4


def test_independent_crop_sizes(tmp_path):
    """rootnet_image_size / other_image_size size the two crops
    INDEPENDENTLY (reference utils.py:77-78); the model's heatmap geometry
    follows the other (regression) crop (full_net.py:62)."""
    import jax
    import jax.numpy as jnp
    from fixtures import make_synthetic_dream_dataset
    from horopose_tpu.config import make_default_cfg
    from horopose_tpu.pipelines.common import (build_fullnet,
                                               get_dataloaders)
    d = make_synthetic_dream_dataset(tmp_path, "panda", n_images=2,
                                     split="train_dr", seed=44)
    cfg = make_default_cfg()
    cfg.train_ds_names = str(d)
    cfg.urdf_robot_name = "panda"
    cfg.image_size = 64.0
    cfg.rootnet_image_size = 32.0      # smaller DepthNet crop
    cfg.other_image_size = 64.0
    cfg.batch_size = 2
    cfg.epoch_size = 2
    cfg.n_dataloader_workers = 2
    cfg.backbone_name = "resnet18"
    cfg.rootnet_backbone_name = "resnet18"
    loaders = get_dataloaders(cfg)
    batch = next(iter(loaders["train"]))
    loaders["train"].close()
    assert batch["root"]["images"].shape[1:3] == (32, 32)
    assert batch["other"]["images"].shape[1:3] == (64, 64)

    # the model runs on the mixed-size pair (rootnet backbone is GAP'd,
    # so its input size is free; heatmap geometry follows the 64px crop)
    model = build_fullnet(cfg)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key},
                           jnp.zeros((1, 64, 64, 3)),
                           jnp.zeros((1, 32, 32, 3)), jnp.ones((1,)),
                           jnp.eye(3)[None], train=False)
    out = model.apply(variables,
                      jnp.asarray(batch["other"]["images"], jnp.float32),
                      jnp.asarray(batch["root"]["images"], jnp.float32),
                      jnp.ones((2,)), jnp.asarray(batch["other"]["K"],
                                                  jnp.float32), train=False)
    assert out["uvd"].shape == (2, 7, 3)

    # the PIPELINE init path must size its dummies the same way (advisor
    # round-3 medium: a square cfg.image_size dummy crashes model.init
    # whenever other_image_size != image_size)
    from horopose_tpu.core.engine import make_optimizer
    from horopose_tpu.pipelines.train_full import init_fullnet_state
    state, _ = init_fullnet_state(cfg, model, make_optimizer(cfg, 10))
    assert int(state.step) == 0


def test_non_square_crop_sizes_rejected():
    """FullNet's heatmap geometry is square (image_size//4 in both axes);
    a rectangular rootnet/other_image_size must raise, not silently decode
    with the wrong width geometry."""
    import pytest
    from horopose_tpu.config import make_default_cfg
    from horopose_tpu.pipelines.common import crop_sizes
    cfg = make_default_cfg()
    cfg.other_image_size = (64, 96)
    with pytest.raises(ValueError, match="non-square"):
        crop_sizes(cfg)
    cfg = make_default_cfg()
    cfg.rootnet_image_size = [128, 64]
    with pytest.raises(ValueError, match="non-square"):
        crop_sizes(cfg)
