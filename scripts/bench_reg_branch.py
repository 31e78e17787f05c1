#!/usr/bin/env python
"""Reg-branch decomposition bench (VERDICT r2 #3): time each piece of the
flagship regression branch — ResNet-50 trunk (per stage), the 3-deconv
stack, the final 1x1 head, the integral decode — on the real chip with the
same chained-on-device methodology as bench.py, and compare the deconv
stack against a conv+depth-to-space rewrite of identical numerics.

Usage: python scripts/bench_reg_branch.py [--batch 128] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timed(fn, x, iters, tag, flops=None):
    """Chained scan: each iteration depends on the last, host-transfer
    synced (PERF_NOTES methodology)."""

    @jax.jit
    def chained(x0):
        def body(c, _):
            out = fn(c)
            return c + out * 1e-9, ()
        c, _ = jax.lax.scan(body, x0, None, length=iters)
        return c.mean()

    t0 = time.perf_counter()
    np.asarray(chained(x))
    compile_s = time.perf_counter() - t0
    dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(chained(x))
        dts.append((time.perf_counter() - t0) / iters)
    ms = 1000.0 * sum(dts) / len(dts)
    util = ""
    if flops:
        tf = flops / (ms / 1000.0) / 1e12
        util = f"  {tf:7.1f} TFLOPs ({100 * tf / 197:.0f}% bf16 peak)"
    print(f"{tag:<42s} {ms:8.3f} ms{util}   (compile {compile_s:.0f}s)",
          file=sys.stderr)
    return ms


def conv_flops(B, H, W, Cin, Cout, k):
    return 2.0 * B * H * W * Cin * Cout * k * k


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()
    B = args.batch
    dtype = jnp.bfloat16

    import flax.linen as nn
    from horopose_tpu.models.resnet import get_resnet
    from horopose_tpu.models.common import batch_norm

    rng = jax.random.PRNGKey(0)

    # ---- ResNet-50 trunk, whole and by stage ----
    model = get_resnet("resnet50", dtype)
    x = jnp.zeros((B, 256, 256, 3), dtype)
    variables = model.init(rng, jnp.zeros((1, 256, 256, 3), dtype),
                           train=False)
    rn50_flops = 0.0  # accumulate rough conv FLOPs for the trunk
    # bottleneck stage flops (ignoring downsample convs ~5%)
    spec = [(3, 64, 64), (4, 128, 32), (6, 256, 16), (3, 512, 8)]
    rn50_flops += conv_flops(B, 128, 128, 3, 64, 7)
    cin = 64
    for n, f, hw in spec:
        for i in range(n):
            rn50_flops += conv_flops(B, hw, hw, cin, f, 1)
            rn50_flops += conv_flops(B, hw, hw, f, f, 3)
            rn50_flops += conv_flops(B, hw, hw, f, f * 4, 1)
            if i == 0:
                rn50_flops += conv_flops(B, hw, hw, cin, f * 4, 1)
            cin = f * 4
    timed(lambda c: model.apply(variables, c, train=False).mean()
          .astype(dtype), x, args.iters, "resnet50 trunk (256^2)", rn50_flops)

    # stem only
    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                        dtype=dtype)(x)
            y = nn.relu(batch_norm(False, dtype=dtype)(y))
            return nn.max_pool(y, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))
    stem = Stem()
    sv = stem.init(rng, jnp.zeros((1, 256, 256, 3), dtype))
    timed(lambda c: stem.apply(sv, c).mean().astype(dtype), x, args.iters,
          "  stem (conv7x7 s2 + maxpool)",
          conv_flops(B, 128, 128, 3, 64, 7))

    # stem via space-to-depth packing
    from horopose_tpu.models.common import stride2_conv_s2d

    class StemS2D(nn.Module):
        @nn.compact
        def __call__(self, x):
            w = self.param("kernel", nn.initializers.normal(0.05),
                           (7, 7, 3, 64), dtype)
            y = stride2_conv_s2d(x, w)
            y = nn.relu(batch_norm(False, dtype=dtype)(y))
            return nn.max_pool(y, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))
    s2 = StemS2D()
    s2v = s2.init(rng, jnp.zeros((1, 256, 256, 3), dtype))
    timed(lambda c: s2.apply(s2v, c).mean().astype(dtype), x, args.iters,
          "  stem via space-to-depth",
          conv_flops(B, 128, 128, 3, 64, 7))

    # hrnet stem pair (two 3x3 s2 convs), plain vs s2d
    class HStem(nn.Module):
        s2d: bool = False

        @nn.compact
        def __call__(self, x):
            w1 = self.param("k1", nn.initializers.normal(0.05),
                            (3, 3, 3, 64), dtype)
            w2 = self.param("k2", nn.initializers.normal(0.05),
                            (3, 3, 64, 64), dtype)
            if self.s2d:
                y = stride2_conv_s2d(x, w1)
            else:
                y = jax.lax.conv_general_dilated(
                    x, w1, (2, 2), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = nn.relu(batch_norm(False, dtype=dtype, name="b1")(y))
            if self.s2d:
                y = stride2_conv_s2d(y, w2)
            else:
                y = jax.lax.conv_general_dilated(
                    y, w2, (2, 2), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return nn.relu(batch_norm(False, dtype=dtype, name="b2")(y))
    hflops = conv_flops(B, 128, 128, 3, 64, 3) + conv_flops(B, 64, 64, 64,
                                                            64, 3)
    for s2d in (False, True):
        hs = HStem(s2d=s2d)
        hv = hs.init(rng, jnp.zeros((1, 256, 256, 3), dtype))
        timed(lambda c: hs.apply(hv, c).mean().astype(dtype), x, args.iters,
              f"  hrnet stem pair (s2d={s2d})", hflops)

    # ---- deconv stack, as-shipped (ConvTranspose) ----
    feat = jnp.zeros((B, 8, 8, 2048), dtype)

    class DeconvStack(nn.Module):
        @nn.compact
        def __call__(self, y):
            for i in range(3):
                y = nn.ConvTranspose(256, (4, 4), (2, 2), padding="SAME",
                                     use_bias=False, dtype=dtype,
                                     name=f"deconv{i}")(y)
                y = batch_norm(False, dtype=dtype, name=f"deconv{i}_bn")(y)
                y = nn.relu(y)
            return y
    ds = DeconvStack()
    dv = ds.init(rng, jnp.zeros((1, 8, 8, 2048), dtype))
    dflops = (conv_flops(B, 16, 16, 2048, 256, 2)
              + conv_flops(B, 32, 32, 256, 256, 2)
              + conv_flops(B, 64, 64, 256, 256, 2)) * 4  # k4s2 = 4 taps/out
    timed(lambda c: ds.apply(dv, c).mean().astype(dtype), feat, args.iters,
          "deconv stack (3x ConvTranspose k4s2)", dflops)

    # ---- deconv rewrite: 2x2 conv with 4x channels + depth-to-space ----
    from horopose_tpu.models.full_net import conv_transpose_d2s

    class DeconvStackD2S(nn.Module):
        @nn.compact
        def __call__(self, y):
            for i in range(3):
                kernel = self.param(f"deconv{i}_kernel",
                                    nn.initializers.normal(0.02),
                                    (4, 4, y.shape[-1], 256), dtype)
                y = conv_transpose_d2s(y, kernel)
                y = batch_norm(False, dtype=dtype, name=f"deconv{i}_bn")(y)
                y = nn.relu(y)
            return y
    d2 = DeconvStackD2S()
    d2v = d2.init(rng, jnp.zeros((1, 8, 8, 2048), dtype))
    timed(lambda c: d2.apply(d2v, c).mean().astype(dtype), feat, args.iters,
          "deconv stack (2x2 conv + depth-to-space)", dflops)

    # ---- final 1x1 head on the 64x64 map ----
    hm_in = jnp.zeros((B, 64, 64, 256), dtype)

    class Head(nn.Module):
        @nn.compact
        def __call__(self, y):
            return nn.Conv(448, (1, 1), dtype=dtype)(y)
    hd = Head()
    hv = hd.init(rng, jnp.zeros((1, 64, 64, 256), dtype))
    timed(lambda c: hd.apply(hv, c).mean().astype(dtype), hm_in, args.iters,
          "final 1x1 conv (256->448 @64^2)",
          conv_flops(B, 64, 64, 256, 448, 1))

    # ---- integral decode ----
    from horopose_tpu.ops.integral import heatmap_integral_pose
    hm = jnp.zeros((B, 448, 64, 64), jnp.float32)
    K = jnp.broadcast_to(jnp.asarray([[320.0, 0, 128], [0, 320.0, 128],
                                      [0, 0, 1]], jnp.float32), (B, 3, 3))
    rt = jnp.zeros((B, 3), jnp.float32)

    def integral(c):
        uvd, xyz = heatmap_integral_pose(
            c, num_joints=7, depth_dim=64, height_dim=64, width_dim=64,
            image_size=256.0, bbox_3d_shape=(1300.0, 1300.0, 1300.0), K=K,
            root_trans=rt, rootid=3, fixroot=True, use_pallas=True)
        return (uvd.sum() + xyz.sum()).astype(jnp.float32)
    timed(integral, hm, args.iters, "integral decode (pallas)")


if __name__ == "__main__":
    main()
