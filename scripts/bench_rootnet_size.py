#!/usr/bin/env python
"""Serving lever #2: shrink the ROOTNET crop, keep the 256 regression crop.

The reference sizes the two crops independently (utils.py:77-78
rootnet_image_size / other_image_size) and the rootnet branch is GAP'd
before its depth head (depth_net.py / full_net.py:252-287), so its input
resolution is a free config knob — and the hrnet32 rootnet branch is the
flagship's bottleneck (31.7 of 52.6 ms at 256², PERF_NOTES). This sweeps
rootnet_image_size at the full flagship config (both backbones + heads +
FK), chained-scan methodology, reporting whole-step throughput.

Accuracy note: like the resnet50-rootnet fast path, this trades rootnet
(depth) accuracy for speed inside the reference's own config space;
validate the depth error on the target dataset before serving with it.
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
    p.add_argument("--sizes", type=int, nargs="+",
                   default=[256, 192, 160, 128])
    p.add_argument("--rootnet_backbone", default="hrnet32")
    args = p.parse_args()

    from horopose_tpu import constants as C
    from horopose_tpu.kinematics import Robot
    from horopose_tpu.models import FullNet

    robot = Robot("panda")
    model = FullNet(
        robot_type="panda", dof=8, num_keypoints=7, image_size=256,
        depth_dim=64, dtype=jnp.bfloat16,
        rootnet_backbone_name=args.rootnet_backbone,
        init_pose=tuple(C.initial_joint_vector("mean", "panda").tolist()))
    rng = jax.random.PRNGKey(0)
    B = args.batch_size

    for rs in args.sizes:
        variables = jax.jit(
            lambda r, xo, xr, k, K: model.init(
                {"params": r, "dropout": r}, xo, xr, k, K, train=False)
        )(rng, jnp.zeros((1, 256, 256, 3), jnp.float32),
          jnp.zeros((1, rs, rs, 3), jnp.float32), jnp.ones((1,)),
          jnp.eye(3)[None])
        x_other = jnp.zeros((B, 256, 256, 3), jnp.float32)
        x_root = jnp.zeros((B, rs, rs, 3), jnp.float32)
        k = jnp.full((B,), 1500.0, jnp.float32)
        K = jnp.broadcast_to(
            jnp.asarray([[320.0, 0, 128], [0, 320.0, 128], [0, 0, 1]],
                        jnp.float32), (B, 3, 3))

        from horopose_tpu.core.profiling import chained_seconds

        def step(c, v, xr, kk, KK):
            # tie the rootnet input to the carry: a loop-invariant
            # x_root would let XLA hoist the whole rootnet branch out
            # of the scan and the sweep would measure nothing
            xr_i = xr + c.mean().astype(xr.dtype) * 1e-9
            out = model.apply(v, c, xr_i, kk, KK, train=False)
            fk = robot.get_keypoints_root(out["pose"], out["rot"],
                                          out["trans"], root=3)
            return c + fk.mean().astype(c.dtype) * 1e-9

        ips = B / chained_seconds(step, x_other, variables, x_root, k, K,
                                  iters=args.iters, passes=2)
        print(json.dumps({"metric": "inference_throughput_rootnet_size",
                          "rootnet_image_size": rs,
                          "value": round(ips, 1),
                          "unit": "images/sec/chip",
                          "batch_size": B,
                          "rootnet_backbone": args.rootnet_backbone}))


if __name__ == "__main__":
    main()
