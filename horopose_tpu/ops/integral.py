"""Soft-argmax ("integral") heatmap decoding.

Functional parity targets (reference, PyTorch):
  /root/reference/lib/utils/integral.py:13-54    norm_heatmap (softmax/gumbel)
  /root/reference/lib/utils/integral.py:75-189   HeatmapIntegralPose
  /root/reference/lib/utils/integral.py:192-232  HeatmapIntegralJoint

TPU-native design: decoding is a pure function of the raw head logits. The
(B, K, D, H, W) softmax-normalized tensor is never materialized twice; the
three marginalizations are single fused reductions that XLA maps onto the
VPU/MXU, and the per-axis expectation is one small matmul. A fully-fused
Pallas kernel for the hot path lives in integral_pallas.py; this module is
the reference implementation and the fallback on non-TPU backends.

The reference's in-place `fixroot` edit (integral.py:135) becomes a
functional scatter.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from horopose_tpu.ops.transforms import invert_K, uvd_to_xyz


def normalize_heatmap(logits: jnp.ndarray, norm_type: str = "softmax",
                      tau: float = 5.0,
                      rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Normalize flattened heatmaps (..., N) to distributions.

    softmax: plain global softmax. sampling: Gumbel-perturbed softmax
    (integral.py:21-29); requires `rng`.
    """
    if norm_type == "softmax":
        return jax.nn.softmax(logits, axis=-1)
    if norm_type == "sampling":
        assert rng is not None, "sampling norm needs an rng key"
        eps = jax.random.uniform(rng, logits.shape, logits.dtype,
                                 minval=1e-20, maxval=1.0)
        log_eps = jnp.log(-jnp.log(eps))
        return jax.nn.softmax(logits - log_eps / tau, axis=-1)
    raise NotImplementedError(norm_type)


def normalize_heatmap_multiple_sampling(logits: jnp.ndarray, rng: jax.Array,
                                        sample_num: int = 1,
                                        tau: float = 5.0) -> jnp.ndarray:
    """Gumbel multi-sample normalization (integral.py:30-41): logits
    (B, K, N) -> (B, sample_num, K, N) distributions."""
    B, K, N = logits.shape
    eps = jax.random.uniform(rng, (B, K, sample_num, N), logits.dtype,
                             minval=1e-20, maxval=1.0)
    log_eps = jnp.log(-jnp.log(eps))
    gumbel = logits[:, :, None, :] - log_eps / tau
    probs = jax.nn.softmax(gumbel, axis=-1)
    return jnp.swapaxes(probs, 1, 2)  # (B, S, K, N)


def soft_argmax_3d(logits: jnp.ndarray, depth_dim: int, height_dim: int,
                   width_dim: int, norm_type: str = "softmax",
                   rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """3D soft-argmax. logits (B, K, D*H*W) or (B, K*D, H, W)-style flattened
    -> uvd (B, K, 3) in [-0.5, 0.5].

    Accepts any input reshapeable to (B, K, D, H, W) with K inferred.
    """
    B = logits.shape[0]
    flat = logits.reshape(B, -1, depth_dim * height_dim * width_dim)
    K = flat.shape[1]
    # softmax in f32 for numerical stability regardless of input dtype
    probs = normalize_heatmap(flat.astype(jnp.float32), norm_type, rng=rng)
    p = probs.reshape(B, K, depth_dim, height_dim, width_dim)
    hm_x = p.sum(axis=(2, 3))  # (B, K, W)
    hm_y = p.sum(axis=(2, 4))  # (B, K, H)
    hm_z = p.sum(axis=(3, 4))  # (B, K, D)
    rng_w = jnp.arange(width_dim, dtype=jnp.float32)
    rng_h = jnp.arange(height_dim, dtype=jnp.float32)
    rng_d = jnp.arange(depth_dim, dtype=jnp.float32)
    coord_x = hm_x @ rng_w / float(width_dim) - 0.5
    coord_y = hm_y @ rng_h / float(height_dim) - 0.5
    coord_z = hm_z @ rng_d / float(depth_dim) - 0.5
    return jnp.stack([coord_x, coord_y, coord_z], axis=-1)


def heatmap_integral_pose(out: jnp.ndarray, *, num_joints: int, depth_dim: int,
                          height_dim: int, width_dim: int, image_size: float,
                          bbox_3d_shape, K: jnp.ndarray,
                          root_trans: jnp.ndarray, rootid: int = 0,
                          fixroot: bool = False, norm_type: str = "softmax",
                          rng: Optional[jax.Array] = None,
                          use_pallas: bool = False):
    """Decode head output to (uvd, xyz) like HeatmapIntegralPose.forward.

    out: raw head logits, any layout reshapeable to
         (B, num_joints, depth_dim, height_dim, width_dim).
    Returns (pred_uvd (B,K,3) in [-0.5,0.5], pred_xyz (B,K,3) metric).
    """
    B = out.shape[0]
    depth_factor = float(bbox_3d_shape[2]) * 1e-3
    if use_pallas and norm_type == "softmax":
        from horopose_tpu.ops.integral_pallas import soft_argmax_3d_pallas
        uvd = soft_argmax_3d_pallas(
            out.reshape(B, num_joints, depth_dim * height_dim * width_dim),
            depth_dim, height_dim, width_dim)
    else:
        uvd = soft_argmax_3d(out.reshape(B, num_joints, -1), depth_dim,
                             height_dim, width_dim, norm_type, rng)
    if fixroot:
        uvd = uvd.at[:, rootid, 2].set(0.0)
    K_inv = invert_K(K.astype(jnp.float32))
    xyz = uvd_to_xyz(uvd, image_size, K_inv, root_trans, depth_factor)
    return uvd, xyz


def heatmap_integral_joint(out: jnp.ndarray, *, dof: int,
                           joint_bounds: jnp.ndarray,
                           norm_type: str = "softmax",
                           rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """1D soft-argmax over per-joint angle heatmaps scaled to joint bounds.

    out: (B, dof, R) or reshapeable; joint_bounds (dof, 2).
    Returns joint angles (B, dof). Matches HeatmapIntegralJoint.forward.
    """
    B = out.shape[0]
    flat = out.reshape(B, dof, -1).astype(jnp.float32)
    res = flat.shape[-1]
    probs = normalize_heatmap(flat, norm_type, rng=rng)
    coord = probs @ jnp.arange(res, dtype=jnp.float32) / float(res)  # (B, dof)
    lo = joint_bounds[:, 0][None]
    hi = joint_bounds[:, 1][None]
    return coord * (hi - lo) + lo
