"""Pallas fused soft-argmax vs the jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from horopose_tpu.ops.integral import soft_argmax_3d
from horopose_tpu.ops.integral_pallas import soft_argmax_3d_pallas


def test_pallas_forward_matches_reference(rng):
    B, K, D, H, W = 2, 3, 4, 8, 8
    logits = jnp.asarray(rng.randn(B, K, D * H * W).astype(np.float32))
    ref = soft_argmax_3d(logits, D, H, W)
    out = soft_argmax_3d_pallas(logits, D, H, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_backward_matches_reference(rng):
    B, K, D, H, W = 1, 2, 4, 8, 8
    logits = jnp.asarray(rng.randn(B, K, D * H * W).astype(np.float32))
    w = jnp.asarray(rng.randn(B, K, 3).astype(np.float32))

    def loss_ref(l):
        return jnp.sum(soft_argmax_3d(l, D, H, W) * w)

    def loss_pal(l):
        return jnp.sum(soft_argmax_3d_pallas(l, D, H, W) * w)

    g_ref = jax.grad(loss_ref)(logits)
    g_pal = jax.grad(loss_pal)(logits)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                               atol=1e-6)


def test_pallas_under_jit(rng):
    B, K, D, H, W = 2, 2, 4, 4, 8
    logits = jnp.asarray(rng.randn(B, K, D * H * W).astype(np.float32))
    f = jax.jit(lambda l: soft_argmax_3d_pallas(l, D, H, W))
    out = f(logits)
    ref = soft_argmax_3d(logits, D, H, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
