"""Pallas TPU prototype: 3x3 SAME conv via OUTPUT space-to-depth packing.

Target: the HRNet branch-0 convs (64x64 spatial, 32->32 channels,
/root/reference/lib/models/backbones/HRnet.py:101-330) whose C_out=32 fills
only 32 of the MXU's 128 lanes — measured at ~20% of bf16 peak vs a 25%
structural lane cap (PERF_NOTES "Why HRNet is slow"). VERDICT r3 #6 asks
for a MEASUREMENT of the hand-kernel route instead of ceiling arithmetic.

The lowering: pack 2x2 output pixels into the lane dimension so the GEMM is
  M = B*(H/2)*(W/2),  K = 4*4*C_in = 512,  N = 2*2*C_out = 128 (full lanes)
at the cost of 16/9 = 1.78x redundant FLOPs (each packed output quad reads
its joint 4x4 input patch; every tap participates in only 9 of 16 kernel
positions, zero-padded in the packed weight matrix). If the MXU runs this
at the ~50% util XLA reaches on lane-friendly convs, the net is ~2.25/1.78
= 1.26x over the 20%-util baseline... measured, not argued — see
scripts/bench_pallas_conv.py and the PERF_NOTES round-4 section for the
verdict on real hardware.

Forward-only prototype (not wired into models/hrnet.py unless the measured
win justifies it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, F) -> (16*C, 4*F) packed GEMM matrix.

    Row index (ry, rx, py, px, c) — the NATURAL layout of the in-kernel
    patch (a lane-axis concatenation of the four packed-input quads; Mosaic
    cannot split the lane dimension with a reshape, so the tap reordering
    lives here on the host instead). dy = 2*ry+py, dx = 2*rx+px index the
    4x4 joint window; column (p, q, f). Zeros where (dy-p, dx-q) falls
    outside the 3x3 window."""
    C, F = w.shape[2], w.shape[3]
    wp = jnp.zeros((4, 4, C, 2, 2, F), w.dtype)
    for p in (0, 1):
        for q in (0, 1):
            wp = wp.at[p:p + 3, q:q + 3, :, p, q, :].set(w)
    wp = wp.reshape(2, 2, 2, 2, C, 2, 2, F)      # ry,py,rx,px,c,p,q,f
    wp = wp.transpose(0, 2, 1, 3, 4, 5, 6, 7)    # ry,rx,py,px,c,p,q,f
    return wp.reshape(16 * C, 4 * F)


def _kernel(xs_ref, w_ref, out_ref):
    """xs_ref: (TB, hp+1, wp+1, 4*C) space-to-depth-packed padded input;
    w_ref: (4, 4*C, 4*F) per-quad weight slabs; out_ref: (TB, hp, wp, 4*F)
    packed output.

    The joint 4x4 input patch of each packed output cell is the 2x2 block
    of packed input cells at (i..i+1, j..j+1). Mosaic supports neither the
    lane-splitting reshape nor concatenation of offset slices, so the K=16C
    GEMM is computed as FOUR accumulated K=4C GEMMs — with C=32 each dot
    has K=128, exactly the MXU's systolic depth, so nothing is lost."""
    TB, hp1, wp1, c4 = xs_ref.shape
    hp, wp = hp1 - 1, wp1 - 1
    F = w_ref.shape[2] // 4
    xs = xs_ref[...]
    acc = jnp.zeros((TB * hp * wp, 4 * F), jnp.float32)
    for idx, (ry, rx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        quad = xs[:, ry:ry + hp, rx:rx + wp, :].reshape(TB * hp * wp, c4)
        acc = acc + jnp.dot(quad, w_ref[idx],
                            preferred_element_type=jnp.float32)
    out_ref[...] = acc.reshape(TB, hp, wp, 4 * F).astype(out_ref.dtype)


def conv3x3_s2d_pallas(x: jnp.ndarray, w: jnp.ndarray,
                       block_b: int = 4) -> jnp.ndarray:
    """3x3 stride-1 SAME conv, no bias: x (B, H, W, C) -> (B, H, W, F).

    H, W must be even; B divisible by block_b. Numerically equivalent to
    lax.conv_general_dilated(..., padding='SAME') in the accumulation dtype
    (validated in tests/test_conv_pallas.py)."""
    B, H, W, C = x.shape
    F = w.shape[3]
    hp, wp = H // 2, W // 2
    assert H % 2 == 0 and W % 2 == 0 and B % block_b == 0

    # pad + input space-to-depth OUTSIDE the kernel (cheap XLA relayout):
    # xs[b, i, j, (py, px, c)] = xpad[b, 2i+py, 2j+px, c]
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xs = xpad.reshape(B, hp + 1, 2, wp + 1, 2, C)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, hp + 1, wp + 1, 4 * C)

    # per-quad slabs: rows of pack_weights are (ry, rx, py, px, c)-ordered,
    # so a plain reshape splits them into the four (4C, 4F) quad matrices
    wmat = pack_weights(w).astype(x.dtype).reshape(4, 4 * C, 4 * F)

    yp = pl.pallas_call(
        _kernel,
        grid=(B // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, hp + 1, wp + 1, 4 * C),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 4 * C, 4 * F), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, hp, wp, 4 * F),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, hp, wp, 4 * F), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(xs, wmat)

    # unpack: yp[b, i, j, (p, q, f)] -> y[b, 2i+p, 2j+q, f]
    y = yp.reshape(B, hp, wp, 2, 2, F).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, H, W, F)
