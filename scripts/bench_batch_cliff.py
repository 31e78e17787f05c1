#!/usr/bin/env python
"""Attribute the b160 throughput cliff (VERDICT r3 #5): time the flagship
forward at several batch sizes, plus its two branch subgraphs in isolation
(XLA dead-code elimination, same trick as pipelines/test.measure_forward_fps)
so the regression is pinned to a branch instead of guessed.

Run on the real TPU: python scripts/bench_batch_cliff.py
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


def main():
    from __graft_entry__ import _make_model_and_robot
    model, robot = _make_model_and_robot(image_size=256, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x1 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x1, x1,
                           jnp.ones((1,)), jnp.eye(3)[None], train=False)

    def timed(B, select, iters=10):
        from horopose_tpu.core.profiling import chained_seconds
        x = jnp.zeros((B, 256, 256, 3), jnp.float32)
        k = jnp.full((B,), 1500.0, jnp.float32)
        K = jnp.broadcast_to(jnp.asarray(
            [[320.0, 0, 128], [0, 320.0, 128], [0, 0, 1]], jnp.float32),
            (B, 3, 3))

        def step(c, v, xx, kk, KK):
            out = model.apply(v, xx + c, xx + c, kk, KK, train=False)
            return c + select(out).astype(c.dtype) * 1e-9

        return chained_seconds(step, jnp.zeros((), jnp.float32),
                               variables, x, k, K, iters=iters)

    rows = {}
    for B in (96, 128, 160, 192):
        t_all = timed(B, lambda o: o["pose"].mean() + o["trans"].mean())
        t_root = timed(B, lambda o: o["depth"].mean())    # hrnet32 rootnet
        t_reg = timed(B, lambda o: o["uvd"].mean())       # resnet50 reg
        rows[B] = dict(all_ms=round(t_all * 1e3, 2),
                       rootnet_hrnet_ms=round(t_root * 1e3, 2),
                       reg_resnet_ms=round(t_reg * 1e3, 2),
                       img_s=round(B / t_all, 1),
                       root_img_s=round(B / t_root, 1),
                       reg_img_s=round(B / t_reg, 1))
        print(f"# B={B}: {rows[B]}", file=sys.stderr)
    print(json.dumps({"metric": "batch_cliff_attribution", "rows": rows}))


if __name__ == "__main__":
    main()
