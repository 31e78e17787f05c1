"""The rendered-image mode of the DREAM fabricator: pixels must carry the
annotated pose (this is what the end-to-end learning proof trains on)."""

import json

import numpy as np
from PIL import Image

from fixtures import make_synthetic_dream_dataset
from horopose_tpu.data import DreamDataset


def test_rendered_fixture_is_pose_correlated(tmp_path):
    root = make_synthetic_dream_dataset(
        tmp_path / "dream", "panda", n_images=2, seed=11,
        image_hw=(120, 160), split="train_dr", render_images=True)
    a = np.asarray(Image.open(root / "000000.jpg"), np.int32)
    b = np.asarray(Image.open(root / "000001.jpg"), np.int32)
    # different poses -> visibly different images (not just noise-level)
    assert np.abs(a - b).mean() > 5.0

    ann = json.loads((root / "000000.json").read_text())
    bb = ann["objects"][0]["bounding_box"]
    x0, y0 = bb["min"]
    x1, y1 = bb["max"]
    # the background is low-frequency; the robot region inside the bbox
    # must contain high-frequency (shaded-edge) structure relative to a
    # same-size background region
    ix0, iy0 = max(int(x0), 0), max(int(y0), 0)
    ix1, iy1 = min(int(x1), 160), min(int(y1), 120)
    inside = a[iy0:iy1, ix0:ix1].astype(np.float32)
    assert inside.size > 0
    grad = np.abs(np.diff(inside, axis=0)).mean()
    corner = a[:20, :20].astype(np.float32)
    grad_bg = np.abs(np.diff(corner, axis=0)).mean()
    assert grad > 2.0 * grad_bg, (grad, grad_bg)

    # the loader consumes the rendered set unchanged
    ds = DreamDataset(root, color_jitter=False, rgb_augmentation=False,
                      occlusion_augmentation=False)
    s = ds[0]
    assert s["keypoints_2d_original"].shape[-1] == 2


def test_upright_mode_encodes_exact_rotation(tmp_path):
    """view_mode='upright' synthesizes a target rotation and must encode it
    as quaternion_xyzw such that the READER's decode reproduces it: the
    loaded TCO has to reproject the annotated keypoints exactly."""
    root = make_synthetic_dream_dataset(
        tmp_path / "dream", "panda", n_images=3, seed=4,
        image_hw=(120, 160), split="train_dr", view_mode="upright")
    ds = DreamDataset(root, color_jitter=False, rgb_augmentation=False,
                      occlusion_augmentation=False)
    for i in range(3):
        s = ds[i]
        TCO = np.asarray(s["TCO"], np.float64)
        kp3d = np.asarray(s["keypoints_3d_original"], np.float64)
        K = np.asarray(s["K_original"], np.float64)
        proj = (K @ kp3d.T).T
        uv = proj[:, :2] / proj[:, 2:3]
        np.testing.assert_allclose(uv, s["keypoints_2d_original"],
                                   atol=1e-3)
        # all keypoints framed (the upright regime centers the centroid)
        assert (uv[:, 0] > -1).all() and (uv[:, 0] < 161).all()
        assert (TCO[2, 3] > 0.5)
