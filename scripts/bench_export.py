#!/usr/bin/env python
"""Validate + benchmark the exported serving artifact on the current
accelerator: export the flagship (or a given experiment), deserialize,
and time `exported.call` under the same chained-on-device methodology as
bench.py. Proves (a) the multi-platform export path works on TPU and
(b) the artifact is performance-neutral vs the in-framework forward.
"""

import argparse
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
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--out", default="/tmp/flagship_export.hlo")
    args = p.parse_args()

    from horopose_tpu.config import make_default_cfg
    from horopose_tpu.pipelines.common import build_fullnet
    from horopose_tpu.tools.export import export_serving_fn, load_exported

    cfg = make_default_cfg()
    cfg.backbone_name = "resnet50"
    cfg.rootnet_backbone_name = "hrnet32"
    cfg.compute_dtype = "bfloat16"
    model = build_fullnet(cfg)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(lambda r, x, k, K: model.init(
        {"params": r, "dropout": r}, x, x, k, K, train=False))(
        rng, jnp.zeros((1, 256, 256, 3)), jnp.ones((1,)), jnp.eye(3)[None])

    platform = jax.default_backend()
    t0 = time.perf_counter()
    blob = export_serving_fn(cfg, variables, batch_size=args.batch_size,
                             platforms=(platform,), dtype=jnp.bfloat16)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"# exported {len(blob) / 1e6:.1f} MB for {platform!r} in "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    exported, weights, meta = load_exported(args.out)
    weights = jax.device_put(weights)
    B = args.batch_size
    x = jnp.zeros((B, 256, 256, 3), jnp.uint8)
    xr = jnp.zeros((B, 256, 256, 3), jnp.uint8)
    k = jnp.full((B,), 1500.0, jnp.float32)
    K = jnp.broadcast_to(jnp.asarray(
        [[320.0, 0, 128], [0, 320.0, 128], [0, 0, 1]], jnp.float32),
        (B, 3, 3))

    @jax.jit
    def chained(w, x0, xr, k, K):
        def body(c, _):
            # the IMAGE inputs must depend on the carry — a k-only
            # dependency lets XLA hoist both loop-invariant backbones out
            # of the scan and the loop times only the heads
            # clip(mean, 0, 0) == 0 for any finite carry, stays
            # data-dependent (XLA cannot fold float clip), and never
            # overflows the uint8 pixels the way an out-of-range
            # float->uint8 conversion of the carry would
            eps = jnp.clip(c.mean(), 0.0, 0.0).astype(jnp.uint8)
            out = exported.call(w, x0 + eps, xr + eps, c, K)  # data-dep
            return c + out["xyz_fk"].mean().astype(c.dtype) * 1e-9, ()
        c, _ = jax.lax.scan(body, k, None, length=args.iters)
        return c.mean()

    t0 = time.perf_counter()
    np.asarray(chained(weights, x, xr, k, K))
    print(f"# compile+run {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(chained(weights, x, xr, k, K))
        dts.append((time.perf_counter() - t0) / args.iters)
    ips = B / (sum(dts) / len(dts))
    print(json.dumps({"metric": "export_artifact_throughput",
                      "value": round(ips, 1), "unit": "images/sec/chip",
                      "batch_size": B, "platform": platform,
                      "artifact_mb": round(len(blob) / 1e6, 1)}))


if __name__ == "__main__":
    main()
