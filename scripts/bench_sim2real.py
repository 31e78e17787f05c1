#!/usr/bin/env python
"""Sim2real (stage-3) training-step benchmark: dense vs tile-culled
rasterizer at the production configuration (batch 16, 480x640 real frames,
teacher at 0.5 scale -> 240x320 rendering, flagship backbones, bf16).

The rasterizer is ~78% of the step (PERF_NOTES round 2), so this sweep
answers "which renderer for which mesh" with measurements instead of
reasoning: `--faces_per_tile 0` is the dense renderer, >0 the tiled one
(ops/rasterizer.py). Uses the built-in primitive meshes (the data/deps
OBJ assets are not shipped in this container; the fine-mesh numbers in
PERF_NOTES come from fabricated OBJ fixtures).

Methodology matches bench_train.py: N steps chained on device inside one
jit with the TrainState as carry, synchronized by a host transfer; mean
of two steady-state passes.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))


def build_cfg(args):
    from horopose_tpu.config import make_default_cfg
    cfg = make_default_cfg()
    cfg.urdf_robot_name = "panda"
    cfg.backbone_name = "resnet50"
    cfg.rootnet_backbone_name = "hrnet32"
    cfg.compute_dtype = "bfloat16"
    cfg.batch_size = args.batch_size
    cfg.mask_loss_func = "mse_mean"
    cfg.mask_loss_weight = 1.0
    cfg.iou_loss_weight = 1.0
    cfg.scale_loss_weight = 0.1
    cfg.align_3d_loss_weight = 1.0
    cfg.reference_keypoint_id = 3
    cfg.known_joint = False
    return cfg


def one_batch(cfg, args):
    tests_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests")
    sys.path.insert(0, tests_dir)
    from fixtures import make_synthetic_dream_dataset
    from horopose_tpu.pipelines.common import get_dataloaders

    tmp = tempfile.mkdtemp(prefix="bench_s2r_")
    d = make_synthetic_dream_dataset(tmp, "panda",
                                     n_images=args.batch_size,
                                     synthetic=False, split="azure", seed=0)
    cfg.train_ds_names = str(d)
    cfg.epoch_size = args.batch_size
    cfg.n_dataloader_workers = 2
    loaders = get_dataloaders(cfg)
    loaders["train"].dataset.return_original_image = True
    batch = next(iter(loaders["train"]))
    loaders["train"].close()
    return batch


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--faces_per_tile", type=int, nargs="+", default=[0])
    args = p.parse_args()

    from horopose_tpu.core.engine import create_train_state, make_optimizer
    from horopose_tpu.kinematics.meshes import build_robot_mesh
    from horopose_tpu.models.deeplab import SegTeacher
    from horopose_tpu.pipelines.common import build_fullnet, make_robot
    from horopose_tpu.pipelines.train_full import init_fullnet_state
    from horopose_tpu.pipelines.train_sim2real import (
        build_sim2real_train_step)

    cfg = build_cfg(args)
    cfg.allow_random_init = True
    batch = one_batch(cfg, args)
    robot = make_robot(cfg)
    robot_mesh = build_robot_mesh(
        robot.model, {n: i for i, n in enumerate(robot.plan.link_names)})
    n_faces = int(robot_mesh.faces.shape[0])
    print(f"# mesh: {n_faces} faces", file=sys.stderr)
    teacher = SegTeacher.init_random(jax.random.PRNGKey(0),
                                     image_hw=(480, 640), scale=0.5)
    model = build_fullnet(cfg)
    tx = make_optimizer(cfg, 100)

    jb = jax.tree.map(jnp.asarray, batch)
    results = {}
    for fpt in args.faces_per_tile:
        cfg.raster_faces_per_tile = int(fpt)
        step = build_sim2real_train_step(cfg, model, robot, robot_mesh,
                                         teacher, tx)
        state, _ = init_fullnet_state(cfg, model, tx)

        @jax.jit
        def chained(state, batch, rng):
            def body(carry, _):
                st, r = carry
                r, sub = jax.random.split(r)
                st, logs = step(st, batch, sub)
                return (st, r), logs["loss"]
            (st, _), losses = jax.lax.scan(
                body, (state, rng), None, length=args.iters)
            return losses.mean()

        rng = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        loss = float(np.asarray(chained(state, jb, rng)))
        print(f"# fpt={fpt}: compile+run {time.perf_counter()-t0:.1f}s "
              f"loss={loss:.4f}", file=sys.stderr)
        dts = []
        state, _ = init_fullnet_state(cfg, model, tx)
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(chained(state, jb, rng))
            dts.append((time.perf_counter() - t0) / args.iters)
            state, _ = init_fullnet_state(cfg, model, tx)
        ms = 1000 * sum(dts) / len(dts)
        results[str(fpt)] = round(ms, 1)
        print(json.dumps({"metric": "sim2real_step_ms",
                          "faces_per_tile": fpt, "value": round(ms, 1),
                          "img_per_s": round(args.batch_size / (ms / 1000),
                                             1),
                          "n_faces": n_faces,
                          "batch_size": args.batch_size}))


if __name__ == "__main__":
    main()
