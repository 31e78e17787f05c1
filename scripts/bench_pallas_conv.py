#!/usr/bin/env python
"""Micro-benchmark: s2d-packed Pallas conv vs XLA conv on the HRNet
branch-0 shape (VERDICT r3 #6 — settle the last ~14% with a measurement).

Run on the real TPU: python scripts/bench_pallas_conv.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from horopose_tpu.ops.conv_pallas import conv3x3_s2d_pallas


DEPTH = 8  # back-to-back convs per scan iteration (in-model-like steady
           # state: weights resident, activations hot, no per-conv HBM
           # cold start)


def timed(fn, x, iters=20):
    """Chained on device inside one jit; steady state, compile excluded.
    Each iteration applies the conv DEPTH times sequentially (32->32
    channels compose), so the per-conv time is amortized over a
    conv-stack-like pipeline rather than a cold standalone dispatch."""
    @jax.jit
    def chained(x0):
        def body(c, _):
            y = c
            for _ in range(DEPTH):
                y = fn(y).astype(c.dtype)
            # feed a perturbation back so iterations chain
            return c + y * 1e-9, ()
        c, _ = jax.lax.scan(body, x0, None, length=iters)
        return c.mean()

    np.asarray(chained(x))
    t0 = time.perf_counter()
    np.asarray(chained(x))
    return (time.perf_counter() - t0) / iters / DEPTH


def main():
    B, H, W, C, F = 128, 64, 64, 32, 32
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C), dtype)
    w = jnp.asarray(rng.randn(3, 3, C, F) * 0.1, dtype)

    def xla_conv(xx):
        return jax.lax.conv_general_dilated(
            xx, w, (1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def pallas_conv(xx):
        return conv3x3_s2d_pallas(xx, w, block_b=4)

    # correctness on device first
    a = np.asarray(xla_conv(x), np.float32)
    b = np.asarray(pallas_conv(x), np.float32)
    err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
    print(f"# rel err pallas vs xla: {err:.2e}", file=sys.stderr)

    t_xla = timed(xla_conv, x)
    t_pal = timed(pallas_conv, x)
    flops = B * H * W * 9 * C * F * 2
    peak = 197e12  # v5e bf16
    print(json.dumps({
        "metric": "conv3x3_64x64x32_b128",
        "xla_ms": round(t_xla * 1e3, 3),
        "pallas_s2d_ms": round(t_pal * 1e3, 3),
        "speedup": round(t_xla / t_pal, 3),
        "xla_util_pct": round(100 * flops / peak / t_xla, 1),
        "pallas_util_pct_true_flops": round(100 * flops / peak / t_pal, 1),
        "rel_err": float(f"{err:.2e}"),
    }))


if __name__ == "__main__":
    main()
