#!/usr/bin/env python
"""CLI: export a trained experiment as a portable serving artifact.

`jax.export` serializes the COMPILED inference function (StableHLO +
weights baked in as constants) so a serving process can run it without
horopose_tpu, Flax, the config system, or the checkpoint format — just
jax and the artifact file. The exported function is the Predictor's
forward: uint8 crops in, the full output head set out (joints, rot6d,
translation, root depth, FK and integral 3D keypoints).

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

_MAGIC = b"HRPX1\n"


def build_serving_fn(cfg, variables, dtype=None):
    """The deployment forward (weights closed over): uint8 crops ->
    normalized -> FullNet -> FK lift. Mirrors Predictor._forward."""
    import jax
    import jax.numpy as jnp

    from horopose_tpu.pipelines.common import build_fullnet, make_robot

    if dtype is not None:
        cfg.compute_dtype = ("bfloat16" if dtype == jnp.bfloat16
                             else "float32")
    model = build_fullnet(cfg)
    robot = make_robot(cfg)
    ref = int(cfg.reference_keypoint_id)

    def serve(x, x_root, k_values, K_crop):
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

    return jax.jit(serve), robot


def export_serving_fn(cfg, variables, batch_size: int = 128,
                      platforms=("tpu", "cpu"), dtype=None) -> bytes:
    """Serialize the serving function for `batch_size` (fixed shape: the
    serving sweet spot is batch 128 and Predictor-style chunking composes
    outside the artifact). Returns the artifact bytes (header + metadata
    + jax.export payload)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from horopose_tpu.pipelines.common import crop_sizes

    serve, robot = build_serving_fn(cfg, variables, dtype=dtype)
    rootnet_hw, other_hw = crop_sizes(cfg)
    B = int(batch_size)
    specs = (
        jax.ShapeDtypeStruct((B, *other_hw, 3), jnp.uint8),
        jax.ShapeDtypeStruct((B, *rootnet_hw, 3), jnp.uint8),
        jax.ShapeDtypeStruct((B,), jnp.float32),
        jax.ShapeDtypeStruct((B, 3, 3), jnp.float32),
    )
    exported = jexport.export(serve, platforms=tuple(platforms))(*specs)
    payload = exported.serialize()
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
    return _MAGIC + struct.pack("<I", len(meta)) + meta + payload


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
    return json.loads(_read_meta(blob)[0])


def _read_meta(blob: bytes):
    if not blob.startswith(_MAGIC):
        raise ValueError("not a horopose_tpu export artifact")
    off = len(_MAGIC)
    (n,) = struct.unpack_from("<I", blob, off)
    off += 4
    return blob[off:off + n].decode(), blob[off + n:]


def load_serving_fn(path: str):
    """Deserialize an artifact -> (callable, metadata dict). The callable
    takes exactly the exported shapes (see metadata)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        blob = f.read()
    meta_json, payload = _read_meta(blob)
    exported = jexport.deserialize(payload)
    return exported.call, json.loads(meta_json)


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
