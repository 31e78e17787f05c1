"""Native C++ crop/resize vs the Python reference path."""

import numpy as np
import pytest

from horopose_tpu import native
from horopose_tpu.data import roboutils as RU
from horopose_tpu.data.augmentations import crop_resize_to_aspect


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _python_reference(rgb, bbox, size):
    """Square pad + plain (non-antialiased) bilinear, align_corners=False."""
    wmin, hmin, wmax, hmax = [int(v) for v in bbox]
    sq = int(max(wmax - wmin, hmax - hmin))
    square = np.zeros((sq, sq, 3), np.float32)
    x_off = int((sq - (wmax - wmin)) // 2)
    y_off = int((sq - (hmax - hmin)) // 2)
    square[y_off:y_off + (hmax - hmin), x_off:x_off + (wmax - wmin)] = \
        rgb[hmin:hmax, wmin:wmax]
    scale = sq / size
    out = np.zeros((size, size, 3), np.float32)
    for oy in range(size):
        fy = (oy + 0.5) * scale - 0.5
        y0 = int(np.floor(fy))
        wy1 = fy - y0
        for ox in range(size):
            fx = (ox + 0.5) * scale - 0.5
            x0 = int(np.floor(fx))
            wx1 = fx - x0
            acc = np.zeros(3, np.float32)
            for dy, wy in ((0, 1 - wy1), (1, wy1)):
                yy = y0 + dy
                if not (0 <= yy < sq):
                    continue
                for dx, wx in ((0, 1 - wx1), (1, wx1)):
                    xx = x0 + dx
                    if not (0 <= xx < sq):
                        continue
                    acc += wy * wx * square[yy, xx]
            out[oy, ox] = acc
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


def test_native_matches_python_bilinear(lib, rng):
    rgb = rng.randint(0, 255, (60, 80, 3), dtype=np.uint8)
    bbox = (10, 5, 70, 55)
    out_native = native.crop_resize_bilinear(rgb, bbox, 32)
    out_ref = _python_reference(rgb, bbox, 32)
    # identical math modulo float rounding in the accumulate order
    diff = np.abs(out_native.astype(int) - out_ref.astype(int))
    assert diff.max() <= 1, diff.max()


def test_native_close_to_pil_path(lib, rng):
    """PIL resize antialiases on downscale (plain bilinear here), so compare
    on a smooth image where both filters agree; noise would decorrelate the
    two by construction."""
    yy, xx = np.meshgrid(np.arange(120), np.arange(160), indexing="ij")
    rgb = np.stack([
        (xx * 255 / 160), (yy * 255 / 120),
        ((xx + yy) * 255 / 280)], axis=-1).astype(np.uint8)
    bbox = (20, 10, 140, 110)
    out_native = native.crop_resize_bilinear(rgb, bbox, 64).astype(np.float32)
    kp3 = rng.uniform(0.5, 1.5, (4, 3))
    K = np.array([[100.0, 0, 80], [0, 100.0, 60], [0, 0, 1]])
    kp2d_dummy = np.zeros((4, 2))
    square, _, K_sq = RU.resize_image(rgb, np.asarray(bbox), kp2d_dummy, K)
    out_pil, _, _ = crop_resize_to_aspect(square, K_sq, kp3, resize=(64, 64))
    corr = np.corrcoef(out_native.reshape(-1),
                       np.asarray(out_pil, np.float32).reshape(-1))[0, 1]
    assert corr > 0.97, corr


def test_dataset_uses_native_consistently(lib, tmp_path, rng):
    """End-to-end: the dataset keypoint-consistency chain must hold on the
    native path (it is the default when available)."""
    from fixtures import make_synthetic_dream_dataset
    from horopose_tpu.data import DreamDataset
    d = make_synthetic_dream_dataset(tmp_path, "panda", n_images=2, seed=9)
    ds = DreamDataset(d, color_jitter=False, rgb_augmentation=False,
                      occlusion_augmentation=False)
    s = ds[0]
    K = s["other"]["K"]
    kp3 = s["other"]["keypoints_3d"]
    proj = (K @ kp3.T).T
    proj = proj[:, :2] / proj[:, 2:3]
    np.testing.assert_allclose(proj, s["other"]["keypoints_2d"], atol=1e-2)


def test_native_throughput_beats_pil(lib, rng):
    import time
    rgb = rng.randint(0, 255, (480, 640, 3), dtype=np.uint8)
    bbox = (100, 50, 500, 430)
    n = 50
    t0 = time.perf_counter()
    for _ in range(n):
        native.crop_resize_bilinear(rgb, bbox, 256)
    t_native = time.perf_counter() - t0
    kp3 = rng.uniform(0.5, 1.5, (7, 3))
    K = np.array([[320.0, 0, 320], [0, 320.0, 240], [0, 0, 1]])
    t0 = time.perf_counter()
    for _ in range(n):
        sq, _, K_sq = RU.resize_image(rgb, np.asarray(bbox),
                                      np.zeros((7, 2)), K.copy())
        crop_resize_to_aspect(sq, K_sq, kp3, resize=(256, 256))
    t_pil = time.perf_counter() - t0
    print(f"native {t_native / n * 1e3:.2f}ms vs python {t_pil / n * 1e3:.2f}ms")
    assert t_native < t_pil


def test_native_jpeg_decode_matches_pil(tmp_path):
    """The libjpeg decode path must be BYTE-IDENTICAL to
    Image.open(...).convert('RGB') — same library, same DCT method — so the
    decode cache and all GT pixels are invariant to which path filled them."""
    from PIL import Image
    from horopose_tpu.native import decode_jpeg, get_lib
    if get_lib() is None or not hasattr(get_lib(), "jpeg_dims"):
        pytest.skip("native decode unavailable")
    rng = np.random.RandomState(7)
    for i, (h, w, quality) in enumerate([(480, 640, 95), (33, 47, 60),
                                         (128, 128, 100)]):
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        p = tmp_path / f"t{i}.jpg"
        Image.fromarray(arr).save(p, quality=quality)
        ours = decode_jpeg(str(p))
        ref = np.asarray(Image.open(p).convert("RGB"))
        assert ours is not None and ours.shape == ref.shape
        np.testing.assert_array_equal(ours, ref)
    # grayscale jpeg -> RGB conversion parity
    g = rng.randint(0, 255, (40, 50), dtype=np.uint8)
    p = tmp_path / "gray.jpg"
    Image.fromarray(g, mode="L").save(p, quality=90)
    ours = decode_jpeg(str(p))
    ref = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(ours, ref)
    # non-jpeg bytes -> graceful None (PIL fallback path)
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"definitely not a jpeg")
    assert decode_jpeg(str(bad)) is None
