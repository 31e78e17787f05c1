#!/usr/bin/env python
"""CLI: export a trained experiment as a portable serving artifact.

`jax.export` serializes the COMPILED inference function (StableHLO) and
the weight tree into one file, so a serving process can run it without
horopose_tpu, the config system, or the checkpoint format — just jax +
flax (for the msgpack weight section). The exported function is the
Predictor's forward: uint8 crops in, the full output head set out
(joints, rot6d, translation, root depth, FK and integral 3D keypoints).

Weights are passed as call-time ARGUMENTS, not baked into the program as
constants: baked constants bloat the HLO by the full parameter size
(~318 MB for the flagship), which slows compiles everywhere and
overflows request-size caps on remote-compile setups; as arguments they
ride the normal (fast) host->device transfer path once.

The reference has no deployment surface beyond its eval script
(scripts/test.py); this closes that gap TPU-natively.

Usage:
  python -m horopose_tpu.tools.export <exp_path> <out.hlo> \
      [--batch_size 128] [--platforms tpu cpu] [--bf16] \
      [--ckpt curr_best_auc\\(add\\)_model.pk]

Serving:
  from horopose_tpu.tools.export import load_serving_fn
  fn, meta = load_serving_fn("model.hlo")
  out = fn(crops_u8, root_crops_u8, k_values, K_crop)   # fixed batch
"""

from __future__ import annotations

import argparse
import json
import os
import struct
import sys

_MAGIC = b"HRPX2\n"


def build_serving_fn(cfg, variables=None, dtype=None):
    """The deployment forward: uint8 crops -> normalized -> FullNet ->
    FK lift, as `serve(variables, x, x_root, k_values, K_crop)`. Mirrors
    Predictor._forward. When `variables` is given, returns a jitted
    closure over them instead (convenience for direct use)."""
    import jax
    import jax.numpy as jnp

    from horopose_tpu.pipelines.common import build_fullnet, make_robot

    if dtype is not None:
        cfg.compute_dtype = ("bfloat16" if dtype == jnp.bfloat16
                             else "float32")
    model = build_fullnet(cfg)
    robot = make_robot(cfg)
    ref = int(cfg.reference_keypoint_id)

    def serve(variables, x, x_root, k_values, K_crop):
        xf = x.astype(jnp.float32) / 255.0
        xrf = x_root.astype(jnp.float32) / 255.0
        out = model.apply(variables, xf, xrf, k_values, K_crop,
                          train=False)
        out["xyz_fk"] = robot.get_keypoints_root(
            out["pose"], out["rot"], out["trans"], root=ref)
        # keep only stable, documented outputs (plain dict pytree)
        return {k: out[k] for k in ("pose", "rot", "trans", "depth",
                                    "xyz_int", "xyz_fk", "uvd")
                if k in out}

    if variables is not None:
        closed = jax.jit(lambda x, xr, k, K: serve(variables, x, xr, k, K))
        return closed, robot
    return serve, robot


def export_serving_fn(cfg, variables, batch_size: int = 128,
                      platforms=("tpu", "cpu"), dtype=None) -> bytes:
    """Serialize the serving function for `batch_size` (fixed shape: the
    serving sweet spot is batch 128 and Predictor-style chunking composes
    outside the artifact). Returns the artifact bytes:
    magic | meta | msgpack weight tree | jax.export payload."""
    import jax
    import jax.numpy as jnp
    from flax import serialization
    from jax import export as jexport

    from horopose_tpu.pipelines.common import crop_sizes

    serve, robot = build_serving_fn(cfg, dtype=dtype)
    rootnet_hw, other_hw = crop_sizes(cfg)
    B = int(batch_size)
    # read shape/dtype without jnp.asarray: that would device-transfer the
    # full ~320 MB weight tree (over the remote tunnel here) just for specs
    var_specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
        variables)
    specs = (
        var_specs,
        jax.ShapeDtypeStruct((B, *other_hw, 3), jnp.uint8),
        jax.ShapeDtypeStruct((B, *rootnet_hw, 3), jnp.uint8),
        jax.ShapeDtypeStruct((B,), jnp.float32),
        jax.ShapeDtypeStruct((B, 3, 3), jnp.float32),
    )
    exported = jexport.export(jax.jit(serve),
                              platforms=tuple(platforms))(*specs)
    payload = exported.serialize()
    weights = serialization.to_bytes(jax.device_get(variables))
    meta = json.dumps({
        "batch_size": B,
        "other_hw": list(other_hw),
        "rootnet_hw": list(rootnet_hw),
        "platforms": list(platforms),
        "robot": str(cfg.urdf_robot_name),
        "dof": int(robot.dof),
        "num_keypoints": int(robot.num_keypoints),
        "reference_keypoint_id": int(cfg.reference_keypoint_id),
        "compute_dtype": str(cfg.get("compute_dtype") or "float32"),
        "inputs": ["crops_uint8 (B,H,W,3)", "root_crops_uint8 (B,h,w,3)",
                   "k_values (B,)", "K_crop (B,3,3)"],
    }).encode()
    return (_MAGIC + struct.pack("<Q", len(meta)) + meta
            + struct.pack("<Q", len(weights)) + weights + payload)


def export_experiment(exp_path: str, out_path: str, batch_size: int = 128,
                      platforms=("tpu", "cpu"), bf16: bool = False,
                      ckpt_name: str = "curr_best_auc(add)_model.pk"):
    """Load the experiment exactly like Predictor.from_experiment, then
    export. Returns the metadata dict."""
    import jax.numpy as jnp

    from horopose_tpu.predictor import Predictor

    pred = Predictor.from_experiment(
        exp_path, ckpt_name=ckpt_name,
        dtype=jnp.bfloat16 if bf16 else jnp.float32)
    blob = export_serving_fn(pred.cfg, pred.variables,
                             batch_size=batch_size, platforms=platforms,
                             dtype=jnp.bfloat16 if bf16 else None)
    with open(out_path, "wb") as f:
        f.write(blob)
    return json.loads(_split_blob(blob)[0])


def _split_blob(blob: bytes):
    """-> (meta_json_str, weights_bytes, payload_bytes)."""
    if not blob.startswith(_MAGIC):
        raise ValueError("not a horopose_tpu export artifact")
    off = len(_MAGIC)
    (n,) = struct.unpack_from("<Q", blob, off)
    off += 8
    meta = blob[off:off + n].decode()
    off += n
    (w,) = struct.unpack_from("<Q", blob, off)
    off += 8
    return meta, blob[off:off + w], blob[off + w:]


def load_exported(path: str):
    """Low-level load: -> (jax.export.Exported, weight tree, meta dict).
    `exported.call(variables, x, x_root, k, K)` is jit-composable; pass
    the weights as an ARGUMENT (e.g. via jax.jit) rather than closing
    over them inside a jit, or they become program constants again."""
    from flax import serialization
    from jax import export as jexport

    with open(path, "rb") as f:
        blob = f.read()
    meta_json, weights_bytes, payload = _split_blob(blob)
    exported = jexport.deserialize(payload)
    variables = serialization.msgpack_restore(weights_bytes)
    return exported, variables, json.loads(meta_json)


def load_serving_fn(path: str):
    """Deserialize an artifact -> (callable, metadata dict). The callable
    takes (crops_u8, root_crops_u8, k_values, K_crop) at exactly the
    exported shapes (see metadata); the weight tree is restored from the
    artifact, moved to device once, and bound automatically."""
    import jax

    exported, variables, meta = load_exported(path)
    variables = jax.device_put(variables)

    def fn(x, x_root, k_values, K_crop):
        return exported.call(variables, x, x_root, k_values, K_crop)

    return fn, meta


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("exp_path")
    p.add_argument("out_path")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--platforms", nargs="+", default=["tpu", "cpu"])
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--ckpt", default="curr_best_auc(add)_model.pk")
    args = p.parse_args(argv)
    meta = export_experiment(args.exp_path, args.out_path,
                             batch_size=args.batch_size,
                             platforms=tuple(args.platforms),
                             bf16=args.bf16, ckpt_name=args.ckpt)
    size = os.path.getsize(args.out_path)
    print(f"wrote {args.out_path} ({size / 1e6:.1f} MB)")
    print(json.dumps(meta, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
