"""Shared model utilities: BatchNorm with freeze support.

The sim2real stage trains with BatchNorm FROZEN (running statistics) while
dropout stays live (reference: train_sim2real.py:144-148 sets m.eval() on
every BN module after model.train()). `frozen_batchnorm()` is a trace-time
context: any BatchNorm constructed while it is active uses running averages
regardless of the `train` flag. Because Flax modules build their graph at
trace time, wrapping the jit'd step construction in the context bakes the
frozen behavior into the compiled program.
"""

from __future__ import annotations

import contextlib
import contextvars

import flax.linen as nn
import jax.numpy as jnp

_BN_FROZEN = contextvars.ContextVar("horopose_bn_frozen", default=False)


@contextlib.contextmanager
def frozen_batchnorm():
    token = _BN_FROZEN.set(True)
    try:
        yield
    finally:
        _BN_FROZEN.reset(token)


def bn_frozen() -> bool:
    return _BN_FROZEN.get()


def batch_norm(train: bool, dtype=jnp.float32, name=None,
               momentum: float = 0.9) -> nn.BatchNorm:
    return nn.BatchNorm(
        use_running_average=(not train) or _BN_FROZEN.get(),
        momentum=momentum, dtype=dtype, name=name)


def stride2_conv_s2d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 odd-kernel conv on a FEW-channel input, computed as a
    space-to-depth packed stride-1 conv.

    The 3-channel image stems (resnet conv1 7x7s2, hrnet conv1/conv2 3x3s2)
    run the MXU at ~8% of bf16 peak: the contraction dim K = k*k*C_in is
    tiny and the stride-2 im2col wastes lanes. Packing 2x2 input pixels
    into channels (C_in -> 4*C_in) and folding the stride into the layout
    quadruples K at identical FLOPs — measured 3x faster on v5e for the
    resnet stem (scripts/bench_reg_branch.py). Numerically identical to
    nn.Conv(k, stride 2, padding (k-1)/2) on the same kernel
    (test_models.py::test_stride2_conv_s2d_equivalence).

    x (B, H, W, C) with H, W even; kernel (k, k, C, F), k odd.
    Returns (B, H/2, W/2, F).
    """
    import jax
    k = kernel.shape[0]
    # the front-pad-by-one phase alignment below is exact only for
    # k ≡ 3 (mod 4) — i.e. the 3x3 and 7x7 stems this helper exists for;
    # k=5/k=9 would need a different pad split and are rejected loudly
    if k % 4 != 3 or kernel.shape[1] != k:
        raise ValueError("stride2_conv_s2d supports square kernels with "
                         "k % 4 == 3 (3, 7, 11, ...); got "
                         f"{kernel.shape}")
    p = (k - 1) // 2                 # the original SAME padding
    T = (k + 1) // 2                 # taps per axis in packed space
    pad_top = (p + 1) // 2
    pad_bot = T - 1 - pad_top
    # front-pad the kernel by one zero row/col so the 2-phase split aligns:
    # packed tap t, phase d reads original tap 2t + d - 1
    kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))   # (k+1, k+1,...)
    C, F = kernel.shape[2], kernel.shape[3]
    kp = kp.reshape(T, 2, T, 2, C, F).transpose(0, 2, 1, 3, 4, 5)
    kp = kp.reshape(T, T, 4 * C, F)
    B, H, W, _ = x.shape
    xs = x.reshape(B, H // 2, 2, W // 2, 2, C)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
    return jax.lax.conv_general_dilated(
        xs, kp.astype(x.dtype), (1, 1),
        padding=((pad_top, pad_bot), (pad_top, pad_bot)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
