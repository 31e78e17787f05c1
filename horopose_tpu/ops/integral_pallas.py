"""Fused Pallas TPU kernel for the 3D soft-argmax integral decode.

The (B, K, D, H, W) heatmap (64x64x64 = 262,144 logits per keypoint at the
256px config) is the largest activation in the model (SURVEY.md section 5.7).
The reference materializes the softmax-normalized 5-D tensor and reduces it
three times (integral.py:107-186). This kernel fuses max, exp, the
normalizer and the three coordinate expectations into ONE pass over VMEM per
(batch, keypoint) cell — the normalized tensor never exists.

Backward is a second fused kernel using the closed-form soft-argmax
gradient: dL/dl_i = p_i * sum_axis g_axis * (idx_axis(i) - E[idx_axis]) /
dim_axis, wrapped in jax.custom_vjp.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(x_ref, uvd_ref, ex_ref):
    """x_ref: (1, D, H, W) logits; uvd_ref / ex_ref: (1, 8, 128) tile-padded
    outputs (coords at [0, 0, 0..2]; 8x128 tile for TPU alignment)."""
    x = x_ref[0].astype(jnp.float32)              # (D, H, W)
    D, H, W = x.shape
    m = jnp.max(x)
    e = jnp.exp(x - m)
    s = jnp.sum(e)
    inv_s = 1.0 / s
    idx_w = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 2
                                     ).astype(jnp.float32)
    idx_h = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 1
                                     ).astype(jnp.float32)
    idx_d = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 0
                                     ).astype(jnp.float32)
    ex = jnp.sum(e * idx_w) * inv_s
    ey = jnp.sum(e * idx_h) * inv_s
    ez = jnp.sum(e * idx_d) * inv_s
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
    sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
    on_row = sub == 0
    ex_ref[...] = jnp.where(on_row & (lane == 0), ex,
                            jnp.where(on_row & (lane == 1), ey,
                                      jnp.where(on_row & (lane == 2), ez,
                                                0.0)))
    uvd_ref[...] = jnp.where(
        on_row & (lane == 0), ex / W - 0.5,
        jnp.where(on_row & (lane == 1), ey / H - 0.5,
                  jnp.where(on_row & (lane == 2), ez / D - 0.5, 0.0)))


def _bwd_kernel(x_ref, ex_ref, g_ref, dx_ref):
    """Closed-form gradient: recompute p, scatter the weighted deviation."""
    x = x_ref[0].astype(jnp.float32)
    D, H, W = x.shape
    m = jnp.max(x)
    e = jnp.exp(x - m)
    p = e / jnp.sum(e)
    idx_w = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 2
                                     ).astype(jnp.float32)
    idx_h = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 1
                                     ).astype(jnp.float32)
    idx_d = jax.lax.broadcasted_iota(jnp.int32, (D, H, W), 0
                                     ).astype(jnp.float32)
    gx = g_ref[0, 0, 0] / W
    gy = g_ref[0, 0, 1] / H
    gz = g_ref[0, 0, 2] / D
    ex = ex_ref[0, 0, 0]
    ey = ex_ref[0, 0, 1]
    ez = ex_ref[0, 0, 2]  # (1, 8, 128) tile-padded refs; [0,0,0..2] live
    dx = p * (gx * (idx_w - ex) + gy * (idx_h - ey) + gz * (idx_d - ez))
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _run_fwd(x5: jnp.ndarray):
    BK, D, H, W = x5.shape
    uvd, ex = pl.pallas_call(
        _fwd_kernel,
        grid=(BK,),
        in_specs=[pl.BlockSpec((1, D, H, W), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((BK, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((BK, 8, 128), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(x5)
    return uvd[:, 0, :3], ex[:, 0, :3]


def _run_bwd(x5: jnp.ndarray, ex: jnp.ndarray, g: jnp.ndarray):
    BK, D, H, W = x5.shape
    BKn = x5.shape[0]
    def tile_pad(a):
        out = jnp.zeros((BKn, 8, 128), jnp.float32)
        return out.at[:, 0, :3].set(a)
    ex = tile_pad(ex)
    g = tile_pad(g)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(BK,),
        in_specs=[
            pl.BlockSpec((1, D, H, W), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, D, H, W), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BK, D, H, W), x5.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x5, ex, g)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def soft_argmax_3d_pallas(logits: jnp.ndarray, depth_dim: int,
                          height_dim: int, width_dim: int) -> jnp.ndarray:
    """logits (B, K, D*H*W) -> uvd (B, K, 3) in [-0.5, 0.5]. Fused on TPU."""
    B, K, _ = logits.shape
    x5 = logits.reshape(B * K, depth_dim, height_dim, width_dim)
    uvd, _ = _run_fwd(x5)
    return uvd.reshape(B, K, 3)


def _sam_fwd(logits, depth_dim, height_dim, width_dim):
    B, K, _ = logits.shape
    x5 = logits.reshape(B * K, depth_dim, height_dim, width_dim)
    uvd, ex = _run_fwd(x5)
    return uvd.reshape(B, K, 3), (logits, ex)


def _sam_bwd(depth_dim, height_dim, width_dim, res, g):
    logits, ex = res
    B, K, _ = logits.shape
    x5 = logits.reshape(B * K, depth_dim, height_dim, width_dim)
    dx = _run_bwd(x5, ex, g.reshape(B * K, 3).astype(jnp.float32))
    return (dx.reshape(logits.shape),)


soft_argmax_3d_pallas.defvjp(_sam_fwd, _sam_bwd)
