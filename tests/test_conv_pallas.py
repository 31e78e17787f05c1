"""Numerical equivalence of the s2d-packed Pallas conv prototype against
lax.conv (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from horopose_tpu.ops.conv_pallas import conv3x3_s2d_pallas


@pytest.mark.parametrize("shape", [(2, 8, 8, 32, 32), (4, 16, 12, 8, 16)])
def test_matches_lax_conv(rng, shape):
    B, H, W, C, F = shape
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, C, F) * 0.1, jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv3x3_s2d_pallas(x, w, block_b=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
