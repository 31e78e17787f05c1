#!/usr/bin/env python
"""Training-step throughput benchmark (secondary metric; bench.py is the
driver-facing inference benchmark).

Measures the COMPLETE supervised training step (normalize + GT prep + both
backbones + FK + 10-loss battery + backward + Adam update) at the reference
training configuration (256x256, batch 64, full.yaml loss weights), using
the honest on-device chained methodology: N steps scanned inside one jit
with the TrainState as the carry, synchronized by a host transfer.
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


def make_fake_batch(B, size, nk, dof):
    r = np.random.RandomState(0)
    K = np.tile(np.asarray([[320.0, 0, size / 2], [0, 320.0, size / 2],
                            [0, 0, 1]], np.float32)[None], (B, 1, 1))
    crop = dict(
        images=r.randint(0, 255, (B, size, size, 3), dtype=np.uint8),
        K=K,
        keypoints_3d=r.uniform(0.5, 1.5, (B, nk, 3)).astype(np.float32),
        keypoints_2d=r.uniform(0, size, (B, nk, 2)).astype(np.float32),
        valid_mask_crop=np.ones((B, nk), np.float32),
        bbox_strict_bounded=np.tile(np.asarray([4, 4, size - 4, size - 4],
                                               np.float32)[None], (B, 1)),
        bbox_gt2d_extended=np.tile(np.asarray([4, 4, size - 4, size - 4],
                                              np.float32)[None], (B, 1)),
    )
    return dict(
        TCO=np.tile(np.eye(4, dtype=np.float32)[None], (B, 1, 1)),
        K_original=K.copy(),
        jointpose=r.uniform(-0.5, 0.5, (B, dof)).astype(np.float32),
        keypoints_2d_original=r.uniform(0, 640, (B, nk, 2)).astype(
            np.float32),
        keypoints_3d_original=crop["keypoints_3d"].copy(),
        valid_mask=np.ones((B, nk), np.float32),
        bbox_strict_bounded_original=crop["bbox_strict_bounded"].copy(),
        bbox_gt2d_extended_original=crop["bbox_gt2d_extended"].copy(),
        root=crop, other=dict(crop),
    )


def run_pipeline_mode(args, cfg, robot, model):
    """Time the ACTUAL training-loop shape of pipelines/train_full.py —
    DataLoader (decode-cached) -> jitted donated step -> DeviceLogAccumulator
    — on a synthetic on-disk DREAM set, steady-state epoch after a warmup
    epoch (compile + cache fill). The chained-scan number (default mode) is
    the device ceiling; this is what the pipeline actually delivers."""
    import tempfile

    from horopose_tpu.core.engine import (build_full_train_step,
                                          create_train_state, make_optimizer)
    from horopose_tpu.core.loggers import DeviceLogAccumulator
    from horopose_tpu.pipelines.common import get_dataloaders

    tests_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests")
    sys.path.insert(0, tests_dir)
    from fixtures import make_synthetic_dream_dataset

    tmp = tempfile.mkdtemp(prefix="bench_pipeline_")
    n_images = min(args.batch_size * 8, 512)
    d = make_synthetic_dream_dataset(tmp, "panda", n_images=n_images,
                                     split="train_dr", seed=0)
    cfg.train_ds_names = str(d)
    cfg.batch_size = args.batch_size
    cfg.epoch_size = args.batch_size * args.iters
    cfg.decode_cache = True
    cfg.n_dataloader_workers = 4

    loaders = get_dataloaders(cfg)
    size = int(cfg.image_size)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(lambda r, x, k, K: model.init(
        {"params": r, "dropout": r}, x, x, k, K, train=False))(
        rng, jnp.zeros((1, size, size, 3)), jnp.ones((1,)), jnp.eye(3)[None])
    tx = make_optimizer(cfg, 1000)
    state = create_train_state(variables, tx)
    step = build_full_train_step(cfg, model, robot, tx)

    def one_epoch(state, rng):
        from horopose_tpu.parallel import prefetch_to_device
        acc = DeviceLogAccumulator(flush_every=100)
        n = 0
        t0 = time.perf_counter()
        # the trainers' actual input path: device staging 2 batches ahead
        for batch in prefetch_to_device(loaders["train"], mesh=None, size=2):
            rng, sub = jax.random.split(rng)
            state, logs = step(state, batch, sub)
            acc.push(logs)
            n += args.batch_size
        acc.flush()
        jax.block_until_ready(state.params)
        return state, rng, n, time.perf_counter() - t0, acc.mean("loss")

    state, rng, n, dt, _ = one_epoch(state, rng)   # compile + cache fill
    print(f"# pipeline warmup epoch: {n} imgs in {dt:.1f}s", file=sys.stderr)
    state, rng, n, dt, loss = one_epoch(state, rng)
    ips = n / dt
    print(json.dumps({"metric": "train_pipeline_throughput",
                      "value": round(ips, 1), "unit": "images/sec/chip",
                      "epoch_s": round(dt, 2), "images": n,
                      "batch_size": args.batch_size,
                      "loss": round(float(loss), 2)}))
    loaders["train"].close()


def run_prestaged_mode(args, cfg, robot, model):
    """Time the training LOOP SHAPE minus the loader: the real per-step
    sequence of pipelines/train_full.py (jitted donated step dispatched
    per batch + DeviceLogAccumulator push, one windowed flush) — i.e. what
    the loop adds over the chained-scan device ceiling: per-dispatch
    overhead and any accidental per-step syncs.

    Two numbers are reported:
    - `resident`: the loop over a device-resident batch. This is the
      loop-shape number — it isolates dispatch + accumulator cost.
    - `staged`: same loop with a fresh host batch transferred per step
      (`jnp.asarray` per leaf). On a LOCAL PJRT host this adds the
      overlappable ~ms HBM copy; over this container's remote-TPU tunnel
      it instead measures the tunnel's per-RPC latency for interleaved
      transfer+execute (measured 3-5x the resident rate, high variance) —
      an environment artifact of the same class as the 1-vCPU loader
      limit, NOT a property of the loop (isolated batch transfer is
      ~20 ms at ~1.2 GB/s; see PERF_NOTES round 4).

    The --pipeline mode (real DataLoader) additionally includes decode +
    augs, which on this 1-vCPU container is the binding constraint
    (~50 img/s); loader scaling is measured separately (bench_loader.py).
    """
    from horopose_tpu.core.engine import (build_full_train_step,
                                          create_train_state, make_optimizer)
    from horopose_tpu.core.loggers import DeviceLogAccumulator

    size = int(cfg.image_size)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(lambda r, x, k, K: model.init(
        {"params": r, "dropout": r}, x, x, k, K, train=False))(
        rng, jnp.zeros((1, size, size, 3)), jnp.ones((1,)), jnp.eye(3)[None])
    tx = make_optimizer(cfg, 1000)
    state = create_train_state(variables, tx)
    step = build_full_train_step(cfg, model, robot, tx)

    n_batches = max(args.iters, 2)
    batches = []
    for i in range(n_batches):
        b = make_fake_batch(args.batch_size, size, robot.num_keypoints,
                            robot.dof)
        # distinct pixel payloads so transfers cannot be deduplicated
        b["root"]["images"] = np.roll(b["root"]["images"], i, axis=0)
        b["other"]["images"] = np.roll(b["other"]["images"], i, axis=0)
        batches.append(b)
    resident_batch = jax.tree.map(jnp.asarray, batches[0])
    jax.block_until_ready(resident_batch)

    def one_epoch(state, rng, mode):
        from horopose_tpu.parallel import prefetch_to_device
        acc = DeviceLogAccumulator(flush_every=100)
        t0 = time.perf_counter()
        if mode == "prefetched":
            # the trainers' actual input path since round 5: batches staged
            # onto device 2 steps ahead so transfers overlap compute
            it = prefetch_to_device(iter(batches), mesh=None, size=2)
        else:
            it = iter(batches)
        for batch in it:
            if mode == "staged":
                db = jax.tree.map(jnp.asarray, batch)
            elif mode == "resident":
                db = resident_batch
            else:
                db = batch
            rng, sub = jax.random.split(rng)
            state, logs = step(state, db, sub)
            acc.push(logs)
        acc.flush()
        jax.block_until_ready(state.params)
        return state, rng, time.perf_counter() - t0, acc.mean("loss")

    state, rng, dt, _ = one_epoch(state, rng, mode="staged")   # compile
    print(f"# prestaged warmup: {n_batches} steps in {dt:.1f}s",
          file=sys.stderr)
    out = {}
    for mode in ("resident", "staged", "prefetched"):
        dts = []
        for _ in range(2):
            state, rng, dt, loss = one_epoch(state, rng, mode)
            dts.append(dt)
        dt = sum(dts) / len(dts)
        out[mode] = round(n_batches * args.batch_size / dt, 1)
        out[f"{mode}_ms_per_step"] = round(1000 * dt / n_batches, 1)
    print(json.dumps({"metric": "train_loop_shape_throughput",
                      "value": out["resident"],
                      "unit": "images/sec/chip",
                      "staged": out["staged"],
                      "prefetched": out["prefetched"],
                      "resident_ms_per_step": out["resident_ms_per_step"],
                      "staged_ms_per_step": out["staged_ms_per_step"],
                      "prefetched_ms_per_step": out["prefetched_ms_per_step"],
                      "batch_size": args.batch_size,
                      "loss": round(float(loss), 2)}))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 backbone compute (mixed precision)")
    p.add_argument("--pipeline", action="store_true",
                   help="time the real pipeline loop (loader -> step -> "
                        "meters) instead of the on-device chained scan")
    p.add_argument("--prestaged", action="store_true",
                   help="time the real loop shape over pre-collated host "
                        "batches (loader excluded; see run_prestaged_mode)")
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--rootnet_backbone", default="hrnet32")
    p.add_argument("--remat", action="store_true",
                   help="per-block jax.checkpoint in both backbones "
                        "(cfg.remat): fits larger batches at extra fwd "
                        "FLOPs")
    args = p.parse_args()

    from horopose_tpu.config import make_default_cfg
    from horopose_tpu.core.engine import (build_full_train_step,
                                          create_train_state, make_optimizer)
    from horopose_tpu.pipelines.common import build_fullnet, make_robot

    cfg = make_default_cfg()
    cfg.backbone_name = args.backbone
    cfg.rootnet_backbone_name = args.rootnet_backbone
    if args.bf16:
        cfg.compute_dtype = "bfloat16"
    if args.remat:
        cfg.remat = True
    for k in ("pose", "rot", "trans", "uv"):
        cfg[f"{k}_loss_weight"] = 1.0
    for k in ("depth", "kp2d", "kp3d", "kp2d_int", "kp3d_int"):
        cfg[f"{k}_loss_weight"] = 10.0

    robot = make_robot(cfg)
    model = build_fullnet(cfg)
    if args.pipeline:
        run_pipeline_mode(args, cfg, robot, model)
        return
    if args.prestaged:
        run_prestaged_mode(args, cfg, robot, model)
        return
    size = int(cfg.image_size)
    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    variables = jax.jit(lambda r, x, k, K: model.init(
        {"params": r, "dropout": r}, x, x, k, K, train=False))(
        rng, jnp.zeros((1, size, size, 3)), jnp.ones((1,)), jnp.eye(3)[None])
    jax.block_until_ready(variables)
    print(f"# init {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    tx = make_optimizer(cfg, 1000)
    state = create_train_state(variables, tx)
    step = build_full_train_step(cfg, model, robot, tx)

    batch = jax.tree.map(jnp.asarray, make_fake_batch(
        args.batch_size, size, robot.num_keypoints, robot.dof))

    @jax.jit
    def chained(state, batch, rng):
        def body(carry, i):
            st, r = carry
            r, sub = jax.random.split(r)
            st, logs = step(st, batch, sub)
            return (st, r), logs["loss"]
        (st, _), losses = jax.lax.scan(body, (state, rng), None,
                                       length=args.iters)
        return losses.mean()

    t0 = time.perf_counter()
    val = np.asarray(chained(state, batch, rng))
    print(f"# compile+run {time.perf_counter() - t0:.1f}s, loss {val:.2f}",
          file=sys.stderr)
    t0 = time.perf_counter()
    np.asarray(chained(state, batch, rng))
    dt = (time.perf_counter() - t0) / args.iters
    ips = args.batch_size / dt
    print(json.dumps({"metric": "train_throughput", "value": round(ips, 1),
                      "unit": "images/sec/chip",
                      "step_ms": round(dt * 1000, 1),
                      "batch_size": args.batch_size}))


if __name__ == "__main__":
    main()
