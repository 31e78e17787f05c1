"""Predictor API: experiment load + full-frame inference end to end."""

import os

import numpy as np
import pytest
import yaml

from fixtures import make_synthetic_dream_dataset
from horopose_tpu.config import make_cfg


@pytest.fixture(scope="module")
def experiment(tmp_path_factory):
    """Train one step so an experiment dir with config.yaml exists."""
    base = tmp_path_factory.mktemp("pred")
    train_dir = make_synthetic_dream_dataset(base / "dream", "panda",
                                             n_images=4, split="train_dr",
                                             seed=40)
    cfg_yaml = dict(
        exp_name="pred_smoke", urdf_robot_name="panda", batch_size=2,
        epoch_size=2, n_epochs=1, n_dataloader_workers=1, image_size=64.0,
        lr=1e-4, use_rootnet_with_reg_int_shared_backbone=True,
        backbone_name="resnet18", rootnet_backbone_name="resnet18",
        kp3d_loss_weight=10.0, depth_loss_weight=10.0,
        reference_keypoint_id=3)
    cfg_path = base / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg_yaml))
    cwd = os.getcwd()
    os.chdir(base)
    try:
        cfg = make_cfg(str(cfg_path))
        cfg.train_ds_names = str(train_dir)
        from horopose_tpu.pipelines.train_full import train_full
        train_full(cfg, max_epochs=1)
    finally:
        os.chdir(cwd)
    return base / "experiments" / "pred_smoke"


def test_predictor_from_experiment(experiment, rng):
    from horopose_tpu.predictor import Predictor
    pred = Predictor.from_experiment(str(experiment))
    B, H, W = 2, 480, 640
    images = rng.randint(0, 255, (B, H, W, 3), dtype=np.uint8)
    K = np.tile(np.asarray([[320.0, 0, 320], [0, 320.0, 240], [0, 0, 1]],
                           np.float32)[None], (B, 1, 1))
    bboxes = np.tile(np.asarray([150, 100, 450, 380], np.float32)[None],
                     (B, 1))
    out = pred(images, K, bboxes)
    assert out["joints"].shape == (B, 8)
    assert out["rotation"].shape == (B, 3, 3)
    assert out["translation"].shape == (B, 3)
    assert out["keypoints_3d"].shape == (B, 7, 3)
    assert out["keypoints_2d"].shape == (B, 7, 2)
    assert np.isfinite(out["keypoints_3d"]).all()
    # rotation output must be a valid rotation matrix
    eye = np.einsum("bij,bkj->bik", out["rotation"], out["rotation"])
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-4)
    # full-frame default bbox also works
    out2 = pred(images, K)
    assert out2["joints"].shape == (B, 8)
    # cliff-proof bucketing: an odd batch is padded up to the next ladder
    # size internally, outputs trimmed back to the submitted size
    images3 = np.concatenate([images, images[:1]])
    out3 = pred(images3, np.concatenate([K, K[:1]]),
                np.concatenate([bboxes, bboxes[:1]]))
    assert out3["joints"].shape == (3, 8)
    assert np.isfinite(out3["keypoints_3d"]).all()


def test_predictor_chunked_batching_matches_direct(experiment, rng,
                                                   monkeypatch):
    """Batches above _MAX_CHUNK are split into chunk launches; outputs must
    equal the per-sample direct results (eval mode has no batch coupling)."""
    import horopose_tpu.predictor as P
    monkeypatch.setattr(P, "_MAX_CHUNK", 4)
    pred = P.Predictor.from_experiment(str(experiment))
    B, H, W = 6, 480, 640
    images = rng.randint(0, 255, (B, H, W, 3), dtype=np.uint8)
    K = np.tile(np.asarray([[320.0, 0, 320], [0, 320.0, 240], [0, 0, 1]],
                           np.float32)[None], (B, 1, 1))
    bboxes = np.tile(np.asarray([150, 100, 450, 380], np.float32)[None],
                     (B, 1))
    out = pred(images, K, bboxes)          # chunks: 4 + 2
    assert out["joints"].shape == (B, 8)
    direct = pred(images[4:], K[4:], bboxes[4:])   # the tail pair, direct
    np.testing.assert_allclose(out["joints"][4:], direct["joints"],
                               rtol=3e-3, atol=2e-4)
    np.testing.assert_allclose(out["keypoints_3d"][4:],
                               direct["keypoints_3d"], rtol=3e-3, atol=2e-4)


def test_predictor_honors_rootnet_image_size(experiment, rng, tmp_path):
    """The rootnet-crop serving lever (rootnet_image_size <
    other/image_size) must flow through Predictor: a smaller root crop is
    produced from the same bbox and fed to the rootnet branch."""
    import shutil
    import yaml as _yaml
    from horopose_tpu.predictor import Predictor

    exp2 = tmp_path / "pred_lever"
    shutil.copytree(str(experiment), exp2)
    cfg_file = exp2 / "config.yaml"
    cfg = _yaml.safe_load(cfg_file.read_text())
    cfg["rootnet_image_size"] = 32.0
    cfg_file.write_text(_yaml.safe_dump(cfg))

    pred = Predictor.from_experiment(str(exp2))
    assert pred.size == 64 and pred.root_size == 32
    B, H, W = 2, 480, 640
    images = rng.randint(0, 255, (B, H, W, 3), dtype=np.uint8)
    K = np.tile(np.asarray([[320.0, 0, 320], [0, 320.0, 240], [0, 0, 1]],
                           np.float32)[None], (B, 1, 1))
    bboxes = np.tile(np.asarray([150, 100, 450, 380], np.float32)[None],
                     (B, 1))
    crops, crops_root, _, _ = pred.preprocess(images, K, bboxes)
    assert crops.shape == (B, 64, 64, 3)
    assert crops_root.shape == (B, 32, 32, 3)
    # same bbox, different resolution: the root crop is a downscale of the
    # same square region (coarse check: means track closely)
    assert abs(crops.mean() - crops_root.mean()) < 3.0
    out = pred(images, K, bboxes)
    assert out["joints"].shape == (B, 8)
    assert np.isfinite(out["keypoints_3d"]).all()
    eye = np.einsum("bij,bkj->bik", out["rotation"], out["rotation"])
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-4)


@pytest.mark.parametrize("robot_type,dof,nkpt",
                         [("kuka", 7, 8), ("baxter", 15, 17)])
def test_predictor_cross_robot(robot_type, dof, nkpt, rng):
    """Predictor is robot-agnostic: kuka/baxter dims (full_net.py:43-53)
    flow from the constants through model build, forward, and FK lift."""
    import jax
    import jax.numpy as jnp
    from horopose_tpu.config import make_default_cfg
    from horopose_tpu.predictor import Predictor

    cfg = make_default_cfg()
    cfg.image_size = 64.0
    cfg.backbone_name = "resnet18"
    cfg.rootnet_backbone_name = "resnet18"
    cfg.urdf_robot_name = robot_type
    cfg.reference_keypoint_id = 2
    pred = Predictor(cfg, None)
    key = jax.random.PRNGKey(0)
    pred.variables = pred.model.init(
        {"params": key, "dropout": key}, jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((1, 64, 64, 3)), jnp.ones((1,)), jnp.eye(3)[None],
        train=False)
    B = 2
    images = rng.randint(0, 255, (B, 480, 640, 3), dtype=np.uint8)
    K = np.tile(np.asarray([[320.0, 0, 320], [0, 320.0, 240], [0, 0, 1]],
                           np.float32)[None], (B, 1, 1))
    out = pred(images, K)
    assert out["joints"].shape == (B, dof)
    assert out["keypoints_3d"].shape == (B, nkpt, 3)
    assert out["keypoints_2d"].shape == (B, nkpt, 2)
    assert np.isfinite(out["keypoints_3d"]).all()


def test_tiling_friendly_batch():
    from horopose_tpu.predictor import tiling_friendly_batch as t
    assert t(1) == 1 and t(3) == 4 and t(64) == 64 and t(65) == 96
    assert t(128) == 128 and t(129) == 256 and t(160) == 256
    assert t(300) == 384


def test_predictor_mesh_serving_matches_single_device(experiment, rng):
    """Data-parallel serving: same outputs as single-device, including the
    non-divisible-batch padding path (B=6 over 8 devices)."""
    import jax
    from horopose_tpu.parallel import make_mesh
    from horopose_tpu.predictor import Predictor

    assert len(jax.devices()) >= 8
    B, H, W = 6, 480, 640
    images = rng.randint(0, 255, (B, H, W, 3), dtype=np.uint8)
    K = np.tile(np.asarray([[320.0, 0, 320], [0, 320.0, 240], [0, 0, 1]],
                           np.float32)[None], (B, 1, 1))
    bboxes = np.tile(np.asarray([150, 100, 450, 380], np.float32)[None],
                     (B, 1))

    single = Predictor.from_experiment(str(experiment))(images, K, bboxes)
    meshed = Predictor.from_experiment(
        str(experiment), mesh=make_mesh(8))(images, K, bboxes)

    assert meshed["joints"].shape == (B, 8)
    # the two runs compile for different batch shapes (6 vs padded 8), so
    # reduction order differs: compare with a relative tolerance
    for key in ("joints", "rotation", "translation", "keypoints_3d",
                "keypoints_2d"):
        np.testing.assert_allclose(single[key], meshed[key], rtol=3e-3,
                                   atol=2e-4, err_msg=key)


def test_predictor_k_value_frame_consistency(experiment, rng):
    """The k prior must pair bbox and fx/fy in the SAME frame, like
    training (engine.prepare_gt:147-156): k = sqrt(fx*fy*1e6)/side is then
    invariant to the crop. Regression: mixing the original-frame bbox with
    the crop-frame intrinsics scaled k by size/sq, biasing predicted root
    depth by the bbox size."""
    from horopose_tpu.predictor import Predictor
    pred = Predictor.from_experiment(str(experiment))
    B, H, W = 2, 480, 640
    images = rng.randint(0, 255, (B, H, W, 3), dtype=np.uint8)
    fx, fy = 321.7, 319.2
    K = np.tile(np.asarray([[fx, 0, 320], [0, fy, 240], [0, 0, 1]],
                           np.float32)[None], (B, 1, 1))
    bboxes = np.asarray([[150, 100, 450, 380],      # 300x280 -> side 300
                         [200, 150, 330, 390]],     # 130x240 -> side 240
                        np.float32)
    _, _, _, k_values = pred.preprocess(images, K, bboxes)
    from horopose_tpu.data import roboutils as RU
    for i in range(B):
        sb = RU.get_bbox(bboxes[i], W, H, strict=True)
        side = max(sb[2] - sb[0], sb[3] - sb[1])
        expect = np.sqrt(fx * fy * 1e6 / (side * side))
        np.testing.assert_allclose(k_values[i], expect, rtol=1e-5)
    # the two bboxes differ in size, so a frame-mixing bug (k multiplied
    # by size/sq) would distort their RATIO; the consistent pairing keeps
    # the ratio equal to side2/side1
    np.testing.assert_allclose(k_values[1] / k_values[0], 300.0 / 240.0,
                               rtol=1e-4)


def test_predictor_empty_batch(experiment):
    """B=0 (detector found no robots) returns empty, shape-correct
    outputs instead of crashing in _forward_bucketed."""
    from horopose_tpu.predictor import Predictor
    pred = Predictor.from_experiment(str(experiment))
    images = np.zeros((0, 480, 640, 3), np.uint8)
    K = np.zeros((0, 3, 3), np.float32)
    out = pred(images, K)
    assert out["joints"].shape == (0, 8)
    assert out["keypoints_3d"].shape == (0, 7, 3)
    assert out["keypoints_2d"].shape == (0, 7, 2)
