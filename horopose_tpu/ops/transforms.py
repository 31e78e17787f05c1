"""Camera-space transforms: uvd <-> xyz, intrinsics handling, projection.

Functional parity targets (reference, PyTorch):
  /root/reference/lib/utils/transforms.py:33-73    uvd_to_xyz (HybrIK-style)
  /root/reference/lib/utils/transforms.py:76-131   xyz_to_uvd (+from_gt2d)
  /root/reference/lib/utils/transforms.py:133-143  uvz2xyz_singlepoint
  /root/reference/lib/utils/transforms.py:145-162  K batch construction
  /root/reference/lib/utils/geometries.py:360-402  get_K_crop_resize
  /root/reference/lib/utils/transforms.py:11-21    point projection

All pure jnp, batched over leading dims, no device literals.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_K(fx, fy, cx, cy, dtype=jnp.float32) -> jnp.ndarray:
    """Build intrinsic matrices (..., 3, 3) from focal/center components."""
    fx, fy, cx, cy = (jnp.asarray(v, dtype) for v in (fx, fy, cx, cy))
    batch = jnp.broadcast_shapes(fx.shape, fy.shape, cx.shape, cy.shape)
    z = jnp.zeros(batch, dtype)
    o = jnp.ones(batch, dtype)
    rows = [
        jnp.stack([jnp.broadcast_to(fx, batch), z, jnp.broadcast_to(cx, batch)], -1),
        jnp.stack([z, jnp.broadcast_to(fy, batch), jnp.broadcast_to(cy, batch)], -1),
        jnp.stack([z, z, o], -1),
    ]
    return jnp.stack(rows, axis=-2)


def invert_K(K: jnp.ndarray) -> jnp.ndarray:
    """Analytic inverse of pinhole K (no skew), shape-preserving."""
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    return make_K(1.0 / fx, 1.0 / fy, -cx / fx, -cy / fy, dtype=K.dtype)


def project_points(K: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Perspective projection: K (..., 3, 3) x points (..., N, 3) -> (..., N, 2).

    Matches point_projection_from_3d (transforms.py:11-21): p = hnorm(K @ X).
    """
    proj = jnp.einsum("...ij,...nj->...ni", K, points)
    z = proj[..., 2:3]
    z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)  # guard degenerate depth
    return proj[..., :2] / z


def uvd_to_xyz(uvd: jnp.ndarray, image_size: float, K_inv: jnp.ndarray,
               root_trans: jnp.ndarray, depth_factor: float,
               return_relative: bool = False) -> jnp.ndarray:
    """Soft-argmax output -> metric camera-frame 3D points.

    uvd (..., N, 3) in [-0.5, 0.5]^2 x [-0.5, 0.5]; K_inv (..., 3, 3);
    root_trans (..., 3). Semantics match the reference's HybrIK-style
    back-projection: uv is remapped to pixel space of the crop, d to metres
    via depth_factor, absolute z = d + root_z, xyz = K^-1 [u v 1]^T * z.
    """
    uv_pix = (uvd[..., :2] + 0.5) * image_size
    dz = uvd[..., 2] * depth_factor
    ones = jnp.ones_like(uv_pix[..., :1])
    uv_homo = jnp.concatenate([uv_pix, ones], axis=-1)
    rays = jnp.einsum("...ij,...nj->...ni", K_inv, uv_homo)
    abs_z = dz + root_trans[..., 2:3]
    xyz = rays * abs_z[..., None]
    if return_relative:
        xyz = xyz - root_trans[..., None, :]
    return xyz


def xyz_to_uvd(xyz: jnp.ndarray, image_size: float, K: jnp.ndarray,
               root_trans: jnp.ndarray, depth_factor: float,
               return_relative: bool = False) -> jnp.ndarray:
    """Inverse of uvd_to_xyz (reference: transforms.py:76-107)."""
    if return_relative:
        xyz = xyz + root_trans[..., None, :]
    uvz = jnp.einsum("...ij,...nj->...ni", K, xyz)
    uv = uvz[..., :2] / uvz[..., 2:3]
    dz = xyz[..., 2] - root_trans[..., 2:3]
    return jnp.concatenate([
        uv / image_size - 0.5,
        (dz / depth_factor)[..., None],
    ], axis=-1)


def uvz_to_xyz_singlepoint(uv: jnp.ndarray, z: jnp.ndarray,
                           K: jnp.ndarray) -> jnp.ndarray:
    """Root translation from (uv pixel coords, metric depth, K).

    uv (..., 2), z (..., 1), K (..., 3, 3) -> xyz (..., 3).
    Matches uvz2xyz_singlepoint (transforms.py:133-143).
    """
    K_inv = invert_K(K)
    xy = uv * z
    uvz = jnp.concatenate([xy, z], axis=-1)
    return jnp.einsum("...ij,...j->...i", K_inv, uvz)


def get_K_crop_resize(K: jnp.ndarray, boxes: jnp.ndarray,
                      orig_size, crop_resize) -> jnp.ndarray:
    """Update K for a crop (boxes xyxy) followed by a resize.

    Matches geometries.py:360-402 (skew unhandled, same half-pixel treatment).
    K (..., 3, 3), boxes (..., 4). orig_size / crop_resize are (h, w)-style
    tuples; only their min/max are used, per the reference.
    """
    K = K.astype(jnp.float32)
    boxes = boxes.astype(jnp.float32)
    crop_resize = jnp.asarray(crop_resize, jnp.float32)
    final_width = jnp.max(crop_resize)
    final_height = jnp.min(crop_resize)
    crop_width = boxes[..., 2] - boxes[..., 0]
    crop_height = boxes[..., 3] - boxes[..., 1]
    crop_cj = (boxes[..., 0] + boxes[..., 2]) / 2
    crop_ci = (boxes[..., 1] + boxes[..., 3]) / 2

    cx = K[..., 0, 2] + (crop_width - 1) / 2 - crop_cj
    cy = K[..., 1, 2] + (crop_height - 1) / 2 - crop_ci

    center_x = (crop_width - 1) / 2
    center_y = (crop_height - 1) / 2
    orig_cx_diff = cx - center_x
    orig_cy_diff = cy - center_y
    scale_x = final_width / crop_width
    scale_y = final_height / crop_height
    scaled_center_x = (final_width - 1) / 2
    scaled_center_y = (final_height - 1) / 2
    fx = scale_x * K[..., 0, 0]
    fy = scale_y * K[..., 1, 1]
    cx = scaled_center_x + scale_x * orig_cx_diff
    cy = scaled_center_y + scale_y * orig_cy_diff
    return make_K(fx, fy, cx, cy, dtype=K.dtype)


def k_value_from_bbox(bboxes: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray,
                      real_area: float = 1000.0 * 1000.0) -> jnp.ndarray:
    """DepthNet camera-geometry prior k = sqrt(fx*fy*real_area / bbox_area).

    bbox_area uses the square of the longer side (reference:
    lib/core/function.py:96-98, scripts/train_depthnet.py:202-213).
    bboxes (..., 4) xyxy; fx, fy (...,).
    """
    side = jnp.maximum(jnp.abs(bboxes[..., 2] - bboxes[..., 0]),
                       jnp.abs(bboxes[..., 3] - bboxes[..., 1]))
    area = side * side
    return jnp.sqrt(fx * fy * real_area / area)
