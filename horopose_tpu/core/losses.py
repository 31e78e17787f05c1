"""Declarative loss registry.

Parity target: the 10 configurable loss blocks of
/root/reference/lib/core/function.py:191-311 (each selectable as
mse/l1/smoothl1/l2norm with the same masking and the trans outlier
down-weighting trick at function.py:249-252).
"""

from __future__ import annotations

import jax.numpy as jnp


def row_mean(x, row_mask=None):
    """Mean of a per-element loss array, restricted to valid batch rows.

    row_mask is an optional (B,) 0/1 validity vector (the eval pipelines'
    `_valid` pad mask): padded duplicate rows contribute exactly zero, so
    the result equals the plain mean over the unpadded batch. With
    row_mask=None this is jnp.mean (the training path, never padded).
    """
    if row_mask is None:
        return jnp.mean(x)
    w = row_mask.reshape((-1,) + (1,) * (x.ndim - 1))
    per_row = x.size // x.shape[0]
    denom = jnp.maximum(jnp.sum(row_mask) * per_row, 1.0)
    return jnp.sum(x * w) / denom


def mse(a, b, row_mask=None):
    return row_mean((a - b) ** 2, row_mask)


def l1(a, b, row_mask=None):
    return row_mean(jnp.abs(a - b), row_mask)


def smooth_l1(a, b, beta: float = 1.0, row_mask=None):
    d = jnp.abs(a - b)
    return row_mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta),
                    row_mask)


_ELEMWISE = {"mse": mse, "l1": l1, "smoothl1": smooth_l1}


def elementwise_loss(kind: str, a, b, row_mask=None):
    try:
        return _ELEMWISE[kind](a, b, row_mask=row_mask)
    except KeyError:
        raise NotImplementedError(f"loss func {kind}")


def masked_norm_loss(pred, gt, mask=None, axis=-1, row_mask=None):
    """l2norm: mean of per-element euclidean errors, optionally weighted by a
    validity mask (mean over valid entries) and/or a (B,) row pad mask."""
    err = jnp.linalg.norm(pred - gt, axis=axis)
    if row_mask is not None:
        rm = jnp.broadcast_to(
            row_mask.reshape((-1,) + (1,) * (err.ndim - 1)), err.shape)
        mask = rm if mask is None else mask * rm
    if mask is None:
        return jnp.mean(err)
    err = err * mask
    return jnp.sum(err) / jnp.maximum(jnp.sum(mask != 0), 1)


def trans_l2norm_with_outlier_downweight(pred, gt, threshold: float = 0.5,
                                         alpha: float = 20.0, row_mask=None):
    """The reference's trans l2norm: if the batch-mean error exceeds 0.5 m,
    re-weight each error by stop_grad(exp(-20 * err))
    (function.py:245-252)."""
    err = jnp.linalg.norm(pred - gt, axis=-1)
    mean_err = row_mean(err, row_mask)
    coeff = jax_stop_gradient(jnp.exp(-alpha * err))
    downweighted = row_mean(err * coeff, row_mask)
    return jnp.where(mean_err > threshold, downweighted, mean_err)


def jax_stop_gradient(x):
    import jax
    return jax.lax.stop_gradient(x)


def iou_loss(pred_mask, gt_mask, eps: float = 1e-6):
    """Soft-IoU loss for silhouettes (train_sim2real.py mask losses)."""
    inter = jnp.sum(pred_mask * gt_mask, axis=(-2, -1))
    union = jnp.sum(pred_mask + gt_mask - pred_mask * gt_mask, axis=(-2, -1))
    return jnp.mean(1.0 - inter / (union + eps))
