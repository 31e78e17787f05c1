"""Rotation representation conversions, batched and jit/vmap friendly.

Functional parity targets (reference, PyTorch):
  /root/reference/lib/utils/geometries.py:21-41   quat -> rotmat
  /root/reference/lib/utils/geometries.py:63-74   rotmat -> quat
  /root/reference/lib/utils/geometries.py:100-132 rot6d <-> rotmat (Zhou et al.)
  /root/reference/lib/utils/geometries.py:134-149 rot9d -> rotmat (SVD)
  /root/reference/lib/utils/geometries.py:154-162 geodesic distance
  /root/reference/lib/utils/geometries.py:164-235 axis-angle -> rotmat (+Taylor)
  /root/reference/lib/utils/geometries.py:337-357 euler extraction
  /root/reference/lib/utils/geometries.py:5-19    batch rodrigues

All functions accept arbitrary leading batch dimensions, never pin devices,
and are differentiable end-to-end.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def normalize_vector(v: jnp.ndarray, eps: float = _EPS) -> jnp.ndarray:
    """L2-normalize along the last axis with a magnitude floor."""
    mag = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(mag, eps)


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (..., 4) in (w, x, y, z) order -> rotation matrix (..., 3, 3)."""
    q = quat / (jnp.linalg.norm(quat, axis=-1, keepdims=True) + 1e-9)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rows = [
        jnp.stack([w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz], -1),
        jnp.stack([2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx], -1),
        jnp.stack([2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2], -1),
    ]
    return jnp.stack(rows, axis=-2)


def quat_xyzw_to_rotmat_dream(quat_xyzw: jnp.ndarray) -> jnp.ndarray:
    """DREAM-annotation quaternion (x, y, z, w) -> rotation matrix.

    The DREAM json files store `quaternion_xyzw`; the reference decodes them
    with a bespoke element table (geometries.py:43-61, used at dream.py:148).
    This reproduces that exact mapping so TCO ground truth matches.
    """
    q = quat_xyzw / (jnp.linalg.norm(quat_xyzw, axis=-1, keepdims=True) + 1e-12)
    # note: reference's quat_to_rotmat_np unpacks its argument as (w,x,y,z) but
    # is *called* with xyzw data, so its "w" is DREAM-x, etc. Keep that wiring.
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rows = [
        jnp.stack([w2 - x2 - y2 + z2, -2 * yz + 2 * wx, 2 * wy + 2 * xz], -1),
        jnp.stack([2 * wx + 2 * yz, -(w2 - x2 + y2 - z2), 2 * xy - 2 * wz], -1),
        jnp.stack([-2 * xz + 2 * wy, 2 * wz + 2 * xy, -(w2 + x2 - y2 - z2)], -1),
    ]
    return jnp.stack(rows, axis=-2)


def rotmat_to_quat(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4) (w, x, y, z).

    Branchless Shepperd form: build all four branch candidates (each equal to
    4*q_i * q up to scale), pick the one keyed by the largest squared
    component, normalize, and standardize to w >= 0. Unlike the reference's
    trace-only formula (geometries.py:21-45), this stays accurate in the
    w ~ 0 regime (rotations near 180 deg), where the trace branch divides by
    a vanishing w. The legacy behavior is kept as rotmat_to_quat_trace.
    """
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tw = 1.0 + m00 + m11 + m22          # = 4w^2
    tx = 1.0 + m00 - m11 - m22          # = 4x^2
    ty = 1.0 - m00 + m11 - m22          # = 4y^2
    tz = 1.0 - m00 - m11 + m22          # = 4z^2
    # candidate rows: 4*q_branch * (w, x, y, z)
    cand = jnp.stack([
        jnp.stack([tw, m21 - m12, m02 - m20, m10 - m01], -1),
        jnp.stack([m21 - m12, tx, m01 + m10, m02 + m20], -1),
        jnp.stack([m02 - m20, m01 + m10, ty, m12 + m21], -1),
        jnp.stack([m10 - m01, m02 + m20, m12 + m21, tz], -1),
    ], axis=-2)                                           # (..., 4, 4)
    scores = jnp.stack([tw, tx, ty, tz], -1)              # (..., 4)
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    q = normalize_vector(q)
    sign = jnp.where(q[..., :1] < 0, -1.0, 1.0)           # w >= 0 convention
    return q * sign


def rotmat_to_quat_trace(matrix: jnp.ndarray) -> jnp.ndarray:
    """The reference's trace-branch-only conversion (geometries.py:21-45):
    wrong near 180 deg rotations, kept for exact-parity comparisons."""
    m = matrix
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    w = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) / 2.0
    w = jnp.maximum(w, _EPS)
    w4 = 4.0 * w
    x = (m[..., 2, 1] - m[..., 1, 2]) / w4
    y = (m[..., 0, 2] - m[..., 2, 0]) / w4
    z = (m[..., 1, 0] - m[..., 0, 1]) / w4
    return normalize_vector(jnp.stack([w, x, y, z], axis=-1))


def rot6d_to_rotmat(r6: jnp.ndarray) -> jnp.ndarray:
    """Zhou et al. 6D representation (..., 6) -> rotation matrix (..., 3, 3).

    Convention (matching the reference): the 6 numbers are the first two ROWS
    of the matrix; Gram-Schmidt gives row x = normalize(r6[:3]),
    row z = normalize(x cross r6[3:]), row y = z cross x.
    """
    x_raw = r6[..., 0:3]
    y_raw = r6[..., 3:6]
    x = x_raw / jnp.linalg.norm(x_raw, axis=-1, keepdims=True)
    z = jnp.cross(x, y_raw)
    z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-2)


def rotmat_to_rot6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> 6D representation: first two rows."""
    return matrix[..., :2, :].reshape(*matrix.shape[:-2], 6)


def rot9d_to_rotmat(r9: jnp.ndarray) -> jnp.ndarray:
    """9D -> SO(3) via symmetric orthogonalization (SVD), det-corrected."""
    m = r9.reshape(*r9.shape[:-1], 3, 3)
    u, _, vt = jnp.linalg.svd(m, full_matrices=False)
    det = jnp.linalg.det(u @ vt)
    vt = jnp.concatenate([vt[..., :2, :], vt[..., 2:, :] * det[..., None, None]],
                         axis=-2)
    return u @ vt


def geodesic_distance(m1: jnp.ndarray, m2: jnp.ndarray) -> jnp.ndarray:
    """Angle (radians, in [0, pi]) between rotation matrices, batched."""
    m = m1 @ jnp.swapaxes(m2, -1, -2)
    cos = (m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2] - 1.0) / 2.0
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))


def axis_angle_to_rotmat(aa: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3), Rodrigues formula.

    Small angles use the first-order Taylor expansion (reference:
    geometries.py:205-210) selected by a theta^2 > eps mask so gradients stay
    finite at the origin.
    """
    theta2 = jnp.sum(aa * aa, axis=-1)
    theta = jnp.sqrt(theta2 + 1e-20)
    # guard the direction for tiny angles (value is masked out anyway)
    safe = jnp.maximum(theta, eps)[..., None]
    w = aa / safe
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    one_c = 1.0 - c
    full = jnp.stack([
        jnp.stack([c + wx * wx * one_c, wx * wy * one_c - wz * s,
                   wy * s + wx * wz * one_c], -1),
        jnp.stack([wz * s + wx * wy * one_c, c + wy * wy * one_c,
                   -wx * s + wy * wz * one_c], -1),
        jnp.stack([-wy * s + wx * wz * one_c, wx * s + wy * wz * one_c,
                   c + wz * wz * one_c], -1),
    ], axis=-2)
    rx, ry, rz = aa[..., 0], aa[..., 1], aa[..., 2]
    ones = jnp.ones_like(rx)
    taylor = jnp.stack([
        jnp.stack([ones, -rz, ry], -1),
        jnp.stack([rz, ones, -rx], -1),
        jnp.stack([-ry, rx, ones], -1),
    ], axis=-2)
    mask = (theta2 > eps)[..., None, None]
    return jnp.where(mask, full, taylor)


def rotmat_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3). Log map."""
    tr = matrix[..., 0, 0] + matrix[..., 1, 1] + matrix[..., 2, 2]
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos)
    axis = jnp.stack([
        matrix[..., 2, 1] - matrix[..., 1, 2],
        matrix[..., 0, 2] - matrix[..., 2, 0],
        matrix[..., 1, 0] - matrix[..., 0, 1],
    ], axis=-1)
    sin = jnp.sin(theta)[..., None]
    scale = jnp.where(jnp.abs(sin) < 1e-6, 0.5, theta[..., None] / (2.0 * sin + 1e-20))
    return axis * scale


def batch_rodrigues(theta: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotmat via the half-angle quaternion route
    (reference: geometries.py:5-19)."""
    angle = jnp.linalg.norm(theta + 1e-8, axis=-1, keepdims=True)
    normalized = theta / angle
    half = angle * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * normalized], axis=-1)
    return quat_to_rotmat(quat)


def euler_from_rotmat(matrix: jnp.ndarray) -> jnp.ndarray:
    """XYZ euler angles (..., 3) from rotation matrices, with the gimbal-lock
    branch of the reference (geometries.py:337-357)."""
    r = matrix
    sy = jnp.sqrt(r[..., 0, 0] ** 2 + r[..., 1, 0] ** 2)
    singular = (sy < 1e-6).astype(r.dtype)
    x = jnp.arctan2(r[..., 2, 1], r[..., 2, 2])
    y = jnp.arctan2(-r[..., 2, 0], sy)
    z = jnp.arctan2(r[..., 1, 0], r[..., 0, 0])
    xs = jnp.arctan2(-r[..., 1, 2], r[..., 1, 1])
    ys = jnp.arctan2(-r[..., 2, 0], sy)
    zs = jnp.zeros_like(z)
    out = jnp.stack([
        x * (1 - singular) + xs * singular,
        y * (1 - singular) + ys * singular,
        z * (1 - singular) + zs * singular,
    ], axis=-1)
    return out


def make_T(rotmat: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Assemble homogeneous transforms (..., 4, 4) from R (..., 3, 3), t (..., 3)."""
    batch = jnp.broadcast_shapes(rotmat.shape[:-2], trans.shape[:-1])
    rotmat = jnp.broadcast_to(rotmat, batch + (3, 3))
    trans = jnp.broadcast_to(trans, batch + (3,))
    top = jnp.concatenate([rotmat, trans[..., :, None]], axis=-1)
    bottom = jnp.zeros(batch + (1, 4), dtype=top.dtype).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def invert_T(T: jnp.ndarray) -> jnp.ndarray:
    """Invert rigid transforms (..., 4, 4) analytically."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", R_inv, t)
    return make_T(R_inv, t_inv)


def rot_to_rotmat(rot: jnp.ndarray) -> jnp.ndarray:
    """Dispatch on trailing dim: 6 -> rot6d, 4 -> quat, 9 -> rot9d."""
    d = rot.shape[-1]
    if d == 6:
        return rot6d_to_rotmat(rot)
    if d == 4:
        return quat_to_rotmat(rot)
    if d == 9:
        return rot9d_to_rotmat(rot)
    raise ValueError(f"unsupported rotation dim {d}")


def rotmat_to_rot(matrix: jnp.ndarray, dim: int) -> jnp.ndarray:
    if dim == 6:
        return rotmat_to_rot6d(matrix)
    if dim == 4:
        return rotmat_to_quat(matrix)
    if dim == 9:
        return matrix.reshape(*matrix.shape[:-2], 9)
    raise ValueError(f"unsupported rotation dim {dim}")
