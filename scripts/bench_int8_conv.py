#!/usr/bin/env python
"""Microbench: int8 (int8 x int8 -> int32) vs bf16 convs on flagship shapes.

Answers "would an int8 PTQ serving path beat the bf16 flagship?" with a
measurement instead of datasheet arithmetic (v5e int8 MXU peak is 2x bf16,
so the temptation is real). Methodology matches bench.py: each iteration's
input depends on the previous output inside one jitted lax.scan (no
reordering/elision), synchronized by a host transfer of a scalar — plain
block_until_ready does not reliably synchronize over the remote-attached
TPU backend and reports dispatch time (>500 TFLOP/s "results").

Shapes: the HRNet-w32 branch bodies (the 31.7 ms lane wall,
/root/reference/lib/models/backbones/HRnet.py:101-330), the layer1
bottleneck-style wide 1x1s, and a ResNet-50-class wide 3x3.

Measured on v5e (2026-08-17, batch 128, 50 chained iters, 4 independent
runs — see PERF_NOTES.md "Round 4: int8"):
  3x3 convs at branch widths (32/64/128/256ch): int8 = ~1x (0.86-1.22x
      across runs; no reliable win either direction within tunnel
      run-to-run variance)
  1x1 256->256 @64x64: int8 = 1.4-1.7x (wins, stable across all runs)
The 3x3 result is the lane wall restated: those convs are not MXU-FLOP
bound, so doubling int8 FLOP peak buys nothing. The only int8 winners
(wide pointwise convs) are ~3 ms of the 52.8 ms flagship step, bounding
the whole-model PTQ payoff at ~1-2% — far under the accuracy-risk +
quant/dequant-boundary cost of a PTQ subsystem. Decision: not wired.
"""
import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# (H, W, Cin, Cout, k) — equal-FLOP ladder down the HRNet branches, plus
# the wide-1x1 and wide-3x3 regimes
SHAPES = [
    (64, 64, 32, 32, 3),     # hrnet branch0 body (the lane wall)
    (32, 32, 64, 64, 3),     # branch1
    (16, 16, 128, 128, 3),   # branch2
    (8, 8, 256, 256, 3),     # branch3 / resnet-class deep 3x3
    (64, 64, 256, 256, 1),   # layer1 bottleneck-style wide pointwise
    (64, 64, 64, 256, 1),    # layer1 expand 1x1
]


def conv(x, w, dt):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dt)


@partial(jax.jit, static_argnames=("mode", "iters"))
def chain(x, w, wt, mode, iters):
    """wt maps Cout back to Cin so the carry shape is stable when Cin!=Cout."""
    def body(c, _):
        if mode == "bf16":
            y = conv(c, w, jnp.bfloat16) * jnp.bfloat16(0.125)
        else:
            acc = conv(c, w, jnp.int32)
            # cheap requantize: arithmetic shift keeps the dependency without
            # a max-reduce epilogue polluting the conv timing
            y = jax.lax.shift_right_arithmetic(acc, 6).astype(jnp.int8)
        if wt is not None:
            y = (conv(y.astype(jnp.bfloat16) if mode != "bf16" else y,
                      wt, jnp.bfloat16) * jnp.bfloat16(0.125))
            if mode != "bf16":
                y = jnp.clip(y, -127, 127).astype(jnp.int8)
        return y, ()
    out, _ = jax.lax.scan(body, x, None, length=iters)
    return out.astype(jnp.float32).mean()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()
    B, iters = args.batch_size, args.iters

    for (H, W, Ci, Co, k) in SHAPES:
        key = jax.random.PRNGKey(0)
        flop = B * H * W * Ci * Co * k * k * 2 * iters
        res = {}
        tag = f"B{B} {H}x{W}x{Ci}->{Co} k{k}"
        print(f"{tag}:")
        for mode in ("bf16", "int8"):
            if mode == "bf16":
                x = jax.random.normal(key, (B, H, W, Ci), jnp.bfloat16)
                w = jax.random.normal(key, (k, k, Ci, Co), jnp.bfloat16) * 0.1
            else:
                x = jax.random.randint(key, (B, H, W, Ci), -127, 127, jnp.int8)
                w = jax.random.randint(key, (k, k, Ci, Co), -4, 4, jnp.int8)
            wt = (None if Ci == Co else
                  jax.random.normal(key, (1, 1, Co, Ci), jnp.bfloat16) * 0.1)
            np.asarray(chain(x, w, wt, mode, iters))          # compile
            dts = []
            for _ in range(3):  # min-of-3: tunnel RPC noise spikes singles
                t0 = time.perf_counter()
                np.asarray(chain(x, w, wt, mode, iters))
                dts.append(time.perf_counter() - t0)
            dt = min(dts)
            res[mode] = dt
            print(f"  {mode}: {dt / iters * 1e3:8.3f} ms/iter  "
                  f"{flop / dt / 1e12:7.1f} TFLOP/s")
        print(f"  -> int8 speedup {res['bf16'] / res['int8']:.2f}x")


if __name__ == "__main__":
    main()
