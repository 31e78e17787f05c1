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
import os

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


class BatchNorm(nn.BatchNorm):
    """nn.BatchNorm with torch running-stat semantics.

    torch.nn.BatchNorm2d updates running_var with the UNBIASED batch
    variance (Bessel n/(n-1) correction) while normalizing with the biased
    one; flax uses the biased variance for both. The reference trains every
    backbone with torch BN (momentum 0.1 — HRnet.py:18 BN_MOMENTUM,
    torchvision-style resnets), so train-mode running stats here apply the
    same correction. Normalization itself is unchanged (both frameworks use
    biased batch variance in train mode), so forward outputs and gradients
    are unaffected — only the running_var trajectory is.

    Named `BatchNorm` so flax auto-naming ("BatchNorm_0", ...) and thus
    checkpoint/converter key layouts are identical to nn.BatchNorm's.
    """

    @nn.compact
    def __call__(self, x, use_running_average=None, *, mask=None):
        from flax.linen.normalization import (_canonicalize_axes,
                                              _compute_stats, _normalize)
        from flax.linen import module as flax_module
        use_running_average = flax_module.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        feature_axes = _canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(i for i in range(x.ndim)
                               if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]

        stat_dtype = (jnp.float32 if self.force_float32_reductions
                      else self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, stat_dtype),
                                feature_shape)
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, stat_dtype),
                               feature_shape)

        if use_running_average:
            mean = ra_mean.value if self.force_float32_reductions \
                else jnp.asarray(ra_mean.value, self.param_dtype)
            var = ra_var.value if self.force_float32_reductions \
                else jnp.asarray(ra_var.value, self.param_dtype)
        else:
            mean, var = _compute_stats(
                x, reduction_axes, dtype=self.dtype,
                axis_name=(self.axis_name if not self.is_initializing()
                           else None),
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance, mask=mask,
                force_float32_reductions=self.force_float32_reductions)
            if not self.is_initializing():
                n = 1
                for ax in reduction_axes:
                    n *= x.shape[ax]
                bessel = float(n) / float(max(n - 1, 1))
                # ablation knob (A/B-ing training-dynamics effects): restore
                # flax's biased running-var update
                if os.environ.get("HOROPOSE_BN_BIASED_RUNNING_VAR") == "1":
                    bessel = 1.0
                ra_mean.value = (self.momentum * ra_mean.value +
                                 (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value +
                                (1 - self.momentum) * (var * bessel))

        return _normalize(
            self, x, mean, var, reduction_axes, feature_axes, self.dtype,
            self.param_dtype, self.epsilon, self.use_bias, self.use_scale,
            self.bias_init, self.scale_init, self.force_float32_reductions)


def batch_norm(train: bool, dtype=jnp.float32, name=None,
               momentum: float = 0.9) -> nn.BatchNorm:
    return BatchNorm(
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
