"""Declarative loss registry.

Parity target: the 10 configurable loss blocks of
/root/reference/lib/core/function.py:191-311 (each selectable as
mse/l1/smoothl1/l2norm with the same masking and the trans outlier
down-weighting trick at function.py:249-252).
"""

from __future__ import annotations

import jax.numpy as jnp


def mse(a, b):
    return jnp.mean((a - b) ** 2)


def l1(a, b):
    return jnp.mean(jnp.abs(a - b))


def smooth_l1(a, b, beta: float = 1.0):
    d = jnp.abs(a - b)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


_ELEMWISE = {"mse": mse, "l1": l1, "smoothl1": smooth_l1}


def elementwise_loss(kind: str, a, b):
    try:
        return _ELEMWISE[kind](a, b)
    except KeyError:
        raise NotImplementedError(f"loss func {kind}")


def masked_norm_loss(pred, gt, mask=None, axis=-1):
    """l2norm: mean of per-element euclidean errors, optionally weighted by a
    validity mask (mean over valid entries)."""
    err = jnp.linalg.norm(pred - gt, axis=axis)
    if mask is None:
        return jnp.mean(err)
    err = err * mask
    return jnp.sum(err) / jnp.maximum(jnp.sum(mask != 0), 1)


def trans_l2norm_with_outlier_downweight(pred, gt, threshold: float = 0.5,
                                         alpha: float = 20.0):
    """The reference's trans l2norm: if the batch-mean error exceeds 0.5 m,
    re-weight each error by stop_grad(exp(-20 * err))
    (function.py:245-252)."""
    err = jnp.linalg.norm(pred - gt, axis=-1)
    mean_err = jnp.mean(err)
    coeff = jax_stop_gradient(jnp.exp(-alpha * err))
    downweighted = jnp.mean(err * coeff)
    return jnp.where(mean_err > threshold, downweighted, mean_err)


def jax_stop_gradient(x):
    import jax
    return jax.lax.stop_gradient(x)


def iou_loss(pred_mask, gt_mask, eps: float = 1e-6):
    """Soft-IoU loss for silhouettes (train_sim2real.py mask losses)."""
    inter = jnp.sum(pred_mask * gt_mask, axis=(-2, -1))
    union = jnp.sum(pred_mask + gt_mask - pred_mask * gt_mask, axis=(-2, -1))
    return jnp.mean(1.0 - inter / (union + eps))
