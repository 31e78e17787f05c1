import jax.numpy as jnp
import numpy as np

from horopose_tpu.ops import transforms as T


def make_batch_K(rng, b):
    fx = rng.uniform(300, 700, b).astype(np.float32)
    fy = rng.uniform(300, 700, b).astype(np.float32)
    cx = rng.uniform(100, 300, b).astype(np.float32)
    cy = rng.uniform(100, 300, b).astype(np.float32)
    return np.asarray(T.make_K(fx, fy, cx, cy))


def test_invert_K(rng):
    K = make_batch_K(rng, 16)
    Kinv = np.asarray(T.invert_K(jnp.asarray(K)))
    eye = K @ Kinv
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-4)


def test_uvd_xyz_roundtrip(rng):
    b, n = 8, 7
    K = jnp.asarray(make_batch_K(rng, b))
    root = rng.uniform(0.5, 2.0, (b, 3)).astype(np.float32)
    uvd = rng.uniform(-0.4, 0.4, (b, n, 3)).astype(np.float32)
    xyz = T.uvd_to_xyz(jnp.asarray(uvd), 256.0, T.invert_K(K),
                       jnp.asarray(root), depth_factor=1.3)
    back = T.xyz_to_uvd(xyz, 256.0, K, jnp.asarray(root), depth_factor=1.3)
    np.testing.assert_allclose(np.asarray(back), uvd, atol=1e-4)


def test_uvd_to_xyz_relative(rng):
    b, n = 4, 5
    K = jnp.asarray(make_batch_K(rng, b))
    root = jnp.asarray(rng.uniform(0.5, 2.0, (b, 3)).astype(np.float32))
    uvd = jnp.asarray(rng.uniform(-0.4, 0.4, (b, n, 3)).astype(np.float32))
    absolute = T.uvd_to_xyz(uvd, 256.0, T.invert_K(K), root, 1.3)
    relative = T.uvd_to_xyz(uvd, 256.0, T.invert_K(K), root, 1.3,
                            return_relative=True)
    np.testing.assert_allclose(np.asarray(absolute - root[:, None, :]),
                               np.asarray(relative), atol=1e-5)


def test_project_points_consistency(rng):
    """Projecting xyz from uvd_to_xyz must reproduce the pixel uv."""
    b, n = 4, 7
    K = jnp.asarray(make_batch_K(rng, b))
    root = jnp.asarray(rng.uniform(0.8, 2.0, (b, 3)).astype(np.float32))
    uvd = jnp.asarray(rng.uniform(-0.3, 0.3, (b, n, 3)).astype(np.float32))
    xyz = T.uvd_to_xyz(uvd, 256.0, T.invert_K(K), root, 1.3)
    uv_pix = np.asarray(T.project_points(K, xyz))
    expect = (np.asarray(uvd[..., :2]) + 0.5) * 256.0
    np.testing.assert_allclose(uv_pix, expect, rtol=1e-4, atol=1e-2)


def test_uvz_singlepoint(rng):
    b = 16
    K = jnp.asarray(make_batch_K(rng, b))
    xyz = rng.uniform(0.2, 2.0, (b, 3)).astype(np.float32)
    proj = np.asarray(T.project_points(K, jnp.asarray(xyz)[:, None, :]))[:, 0]
    out = T.uvz_to_xyz_singlepoint(jnp.asarray(proj), jnp.asarray(xyz[:, 2:3]),
                                   K)
    np.testing.assert_allclose(np.asarray(out), xyz, rtol=1e-4, atol=1e-4)


def test_get_K_crop_resize_identity():
    K = T.make_K(320.0, 320.0, 320.0, 240.0)[None]
    # full-image "crop" + same-size resize must leave K unchanged
    boxes = jnp.asarray([[0.0, 0.0, 640.0, 480.0]])
    newK = T.get_K_crop_resize(K, boxes, (480, 640), (480, 640))
    # the reference formula re-centers on (w-1)/2, introducing a fixed
    # half-pixel shift of the principal point even for an identity crop
    np.testing.assert_allclose(np.asarray(newK), np.asarray(K), atol=0.51)


def test_get_K_crop_resize_projection_consistency(rng):
    """A 3D point projected with new K in the crop frame must land where the
    original projection lands after the crop+resize pixel mapping."""
    K = jnp.asarray(make_batch_K(rng, 1))
    pt = jnp.asarray([[0.1, -0.05, 1.5]], jnp.float32)[None]
    box = np.array([[100.0, 80.0, 420.0, 400.0]], np.float32)  # 320x320 crop
    newK = T.get_K_crop_resize(K, jnp.asarray(box), (480, 640), (256, 256))
    uv_orig = np.asarray(T.project_points(K, pt))[0, 0]
    uv_new = np.asarray(T.project_points(newK, pt))[0, 0]
    scale = 256.0 / 320.0
    # reference mapping keeps half-pixel centers; allow that slack
    expect = (uv_orig - box[0, :2]) * scale
    np.testing.assert_allclose(uv_new, expect, atol=0.51)


def test_k_value(rng):
    bboxes = jnp.asarray([[0.0, 0.0, 100.0, 50.0]])
    fx = jnp.asarray([500.0])
    fy = jnp.asarray([500.0])
    k = np.asarray(T.k_value_from_bbox(bboxes, fx, fy))
    np.testing.assert_allclose(k, [np.sqrt(500 * 500 * 1e6 / 1e4)], rtol=1e-6)
