import jax
import jax.numpy as jnp
import numpy as np
import pytest

from horopose_tpu.ops import rotations as R

jax.config.update("jax_enable_x64", False)


def random_rotmats(rng, n):
    """Uniformly-ish random rotations via QR of gaussian matrices."""
    a = rng.randn(n, 3, 3).astype(np.float32)
    q, r = np.linalg.qr(a)
    d = np.sign(np.diagonal(r, axis1=-2, axis2=-1))
    q = q * d[:, None, :]
    det = np.linalg.det(q)
    q[det < 0, :, 0] *= -1
    return q.astype(np.float32)


def test_quat_rotmat_roundtrip(rng):
    mats = random_rotmats(rng, 64)
    quat = R.rotmat_to_quat(jnp.asarray(mats))
    back = R.quat_to_rotmat(quat)
    np.testing.assert_allclose(np.asarray(back), mats, atol=2e-3)


def test_rot6d_roundtrip(rng):
    mats = random_rotmats(rng, 64)
    r6 = R.rotmat_to_rot6d(jnp.asarray(mats))
    back = R.rot6d_to_rotmat(r6)
    np.testing.assert_allclose(np.asarray(back), mats, atol=1e-5)


def test_rot6d_orthonormal(rng):
    r6 = jnp.asarray(rng.randn(32, 6).astype(np.float32))
    m = np.asarray(R.rot6d_to_rotmat(r6))
    eye = np.einsum("bij,bkj->bik", m, m)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)


def test_rot9d_projects_to_so3(rng):
    r9 = jnp.asarray(rng.randn(16, 9).astype(np.float32))
    m = np.asarray(R.rot9d_to_rotmat(r9))
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-4)
    eye = np.einsum("bij,bkj->bik", m, m)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-4)


def test_rot9d_identity_on_so3(rng):
    mats = random_rotmats(rng, 16)
    back = np.asarray(R.rot9d_to_rotmat(jnp.asarray(mats.reshape(16, 9))))
    np.testing.assert_allclose(back, mats, atol=1e-4)


def test_axis_angle_roundtrip(rng):
    aa = rng.randn(64, 3).astype(np.float32)
    # keep angles away from the theta ~ pi log-map singularity
    norm = np.linalg.norm(aa, axis=1, keepdims=True)
    aa = aa / norm * (norm % 2.8)
    m = R.axis_angle_to_rotmat(jnp.asarray(aa))
    back = np.asarray(R.rotmat_to_axis_angle(m))
    # same rotation up to 2pi wrap; compare matrices
    m2 = R.axis_angle_to_rotmat(jnp.asarray(back))
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=2e-4)


def test_axis_angle_tiny_angle_taylor():
    aa = jnp.asarray([[1e-9, -1e-9, 1e-9], [0.0, 0.0, 0.0]], jnp.float32)
    m = np.asarray(R.axis_angle_to_rotmat(aa))
    np.testing.assert_allclose(m, np.broadcast_to(np.eye(3), m.shape), atol=1e-6)
    # gradient must be finite at zero
    g = jax.jacobian(lambda a: R.axis_angle_to_rotmat(a).sum())(aa)
    assert np.isfinite(np.asarray(g)).all()


def test_batch_rodrigues_matches_axis_angle(rng):
    aa = rng.randn(32, 3).astype(np.float32)
    m1 = np.asarray(R.batch_rodrigues(jnp.asarray(aa)))
    m2 = np.asarray(R.axis_angle_to_rotmat(jnp.asarray(aa)))
    np.testing.assert_allclose(m1, m2, atol=1e-4)


def test_geodesic_distance(rng):
    mats = random_rotmats(rng, 8)
    d = np.asarray(R.geodesic_distance(jnp.asarray(mats), jnp.asarray(mats)))
    np.testing.assert_allclose(d, 0.0, atol=1e-3)
    # known angle rotation about z
    theta = 0.7
    rz = np.array([[np.cos(theta), -np.sin(theta), 0],
                   [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], np.float32)
    d = R.geodesic_distance(jnp.asarray(rz)[None], jnp.eye(3)[None])
    np.testing.assert_allclose(np.asarray(d), theta, atol=1e-5)


def test_euler_extraction(rng):
    theta = 0.3
    rz = np.array([[np.cos(theta), -np.sin(theta), 0],
                   [np.sin(theta), np.cos(theta), 0], [0, 0, 1]], np.float32)
    e = np.asarray(R.euler_from_rotmat(jnp.asarray(rz)[None]))[0]
    np.testing.assert_allclose(e, [0.0, 0.0, theta], atol=1e-5)


def test_make_invert_T(rng):
    mats = random_rotmats(rng, 16)
    t = rng.randn(16, 3).astype(np.float32)
    T = R.make_T(jnp.asarray(mats), jnp.asarray(t))
    Tinv = R.invert_T(T)
    eye = np.asarray(T @ Tinv)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), eye.shape),
                               atol=1e-5)


def test_quat_xyzw_dream_is_rotation(rng):
    q = rng.randn(32, 4).astype(np.float32)
    m = np.asarray(R.quat_xyzw_to_rotmat_dream(jnp.asarray(q)))
    eye = np.einsum("bij,bkj->bik", m, m)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-4)


@pytest.mark.parametrize("dim", [4, 6, 9])
def test_rot_dispatch_roundtrip(rng, dim):
    mats = random_rotmats(rng, 8)
    rep = R.rotmat_to_rot(jnp.asarray(mats), dim)
    assert rep.shape == (8, dim)
    back = np.asarray(R.rot_to_rotmat(rep))
    np.testing.assert_allclose(back, mats, atol=2e-3)


def test_rotmat_to_quat_near_180(rng):
    """Property test over near-180-degree rotations: the 4-branch form must
    round-trip where the reference's trace-only branch breaks down."""
    import numpy as np
    axes = rng.randn(64, 3)
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angles = np.pi - rng.uniform(0, 1e-3, 64)     # w ~ 0 regime
    aa = axes * angles[:, None]
    mats = R.axis_angle_to_rotmat(jnp.asarray(aa, jnp.float32))
    quat = R.rotmat_to_quat(mats)
    back = R.quat_to_rotmat(quat)
    np.testing.assert_allclose(np.asarray(back), np.asarray(mats), atol=2e-5)
    assert np.all(np.asarray(quat)[:, 0] >= 0)    # w >= 0 convention
    # the trace-only branch is demonstrably worse here (that's WHY we fixed it)
    quat_tr = R.rotmat_to_quat_trace(mats)
    back_tr = np.asarray(R.quat_to_rotmat(quat_tr))
    err_new = np.abs(np.asarray(back) - np.asarray(mats)).max()
    err_tr = np.abs(back_tr - np.asarray(mats)).max()
    assert err_new < err_tr


def test_rotmat_to_quat_random_rotations(rng):
    import numpy as np
    aa = rng.randn(256, 3).astype(np.float32)
    mats = R.axis_angle_to_rotmat(jnp.asarray(aa))
    back = R.quat_to_rotmat(R.rotmat_to_quat(mats))
    np.testing.assert_allclose(np.asarray(back), np.asarray(mats), atol=1e-5)
