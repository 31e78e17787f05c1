"""End-to-end inference API: full frames in, robot state + pose out.

The reference's only inference surface is the evaluation harness
(scripts/test.py), which needs DREAM annotations for bboxes. This predictor
packages the same pipeline for deployment: per-frame bbox (from any
detector; defaults to the full frame), fused native crop, k-value prior,
jitted FullNet forward, FK lift, and projection back into the ORIGINAL
frame via the crop-adjusted intrinsics.

Usage:
    pred = Predictor.from_experiment("experiments/panda_full")
    out = pred(images_uint8, K, bboxes=det_bboxes)   # (B,H,W,3), (B,3,3)
    out["joints"], out["rotation"], out["translation"],
    out["keypoints_3d"], out["keypoints_2d"]
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from horopose_tpu import constants as C
from horopose_tpu.config import make_cfg
from horopose_tpu.core.checkpoint import load_checkpoint_file, restore_state
from horopose_tpu.core.engine import create_train_state, make_optimizer
from horopose_tpu.data import roboutils as RU
from horopose_tpu.ops.rotations import rot_to_rotmat
from horopose_tpu.ops.transforms import k_value_from_bbox, project_points
from horopose_tpu.pipelines.common import build_fullnet, make_robot


# Measured v5e batch-size ladder (PERF_NOTES round-3/4 sweep + the round-4
# branch attribution, scripts/bench_batch_cliff.py): throughput is
# NON-monotonic in batch — b128 hits the sweet spot (2506 img/s) while every
# batch ABOVE 128 drops the hrnet32 rootnet branch's throughput by ~35%
# (XLA picks a worse conv tiling for the 32-channel stack past b128; the
# resnet reg branch scales flat). Callers must not be able to silently land
# there, so submitted batches are padded UP to the nearest ladder size
# (<=128), and batches above 128 are processed in chunks of at most 128
# (128+128+... with the tail padded up the ladder) — measured faster than
# one big padded launch. Bucketing also bounds the number of distinct
# compiled shapes in a serving process.
_BATCH_LADDER = (1, 2, 4, 8, 16, 32, 64, 96, 128)
_MAX_CHUNK = 128


def tiling_friendly_batch(b: int) -> int:
    """Smallest tiling-friendly batch >= b (see _BATCH_LADDER); sizes above
    _MAX_CHUNK are handled by chunking in Predictor.__call__, so this only
    defines the <=128 ladder (and rounds bigger values up to a multiple of
    _MAX_CHUNK for callers that want a single launch)."""
    for s in _BATCH_LADDER:
        if b <= s:
            return s
    return -(-b // _MAX_CHUNK) * _MAX_CHUNK


class Predictor:
    def __init__(self, cfg, variables, dtype=jnp.float32, mesh=None):
        """mesh: optional jax.sharding.Mesh. A 'data' axis gives
        data-parallel serving (params replicated, batch split along axis
        0, padded up to axis-size divisibility); a 'spatial' axis
        additionally splits the image H dimension across devices for
        latency-mode serving (XLA halo-exchanged convs; see
        parallel.image_sharding). Hybrids: make_mesh(
        axis_names=("data", "spatial"), shape=(d, s))."""
        self.cfg = cfg
        self.mesh = mesh
        self.robot = make_robot(cfg)
        if dtype is not None:
            cfg.compute_dtype = ("bfloat16" if dtype == jnp.bfloat16
                                 else "float32")
        self.model = build_fullnet(cfg)
        self.variables = variables
        from horopose_tpu.pipelines.common import crop_sizes
        rootnet_hw, other_hw = crop_sizes(cfg)
        # the two crops share the bbox and differ only in resolution
        # (data/dream.py _make_crop call sites; ref dream.py:281-388), so
        # serving mirrors that: one bbox, two resize targets
        self.size = other_hw[0]
        self.root_size = rootnet_hw[0]
        self.ref = int(cfg.reference_keypoint_id)

        model, robot, ref = self.model, self.robot, self.ref

        @jax.jit
        def _forward(variables, x, x_root, k_values, K_crop):
            xf = x.astype(jnp.float32) / 255.0
            xrf = x_root.astype(jnp.float32) / 255.0
            out = model.apply(variables, xf, xrf, k_values, K_crop,
                              train=False)
            out["xyz_fk"] = robot.get_keypoints_root(
                out["pose"], out["rot"], out["trans"], root=ref)
            return out

        self._forward = _forward

    # ------------------------------------------------------------------
    @classmethod
    def from_experiment(cls, exp_path: str,
                        ckpt_name: str = "curr_best_auc(add)_model.pk",
                        dtype=jnp.float32, mesh=None) -> "Predictor":
        cfg = make_cfg(os.path.join(exp_path, "config.yaml"))
        predictor = cls(cfg, None, dtype=dtype, mesh=mesh)
        rng = jax.random.PRNGKey(0)
        s, rs = predictor.size, predictor.root_size
        from horopose_tpu.pipelines.common import jit_init
        variables = jit_init(
            predictor.model, rng, jnp.zeros((1, s, s, 3)),
            jnp.zeros((1, rs, rs, 3)), jnp.ones((1,)), jnp.eye(3)[None])
        ckpt_path = os.path.join(exp_path, "ckpt", ckpt_name)
        if os.path.exists(ckpt_path):
            tx = make_optimizer(cfg, 1)
            state = create_train_state(variables, tx)
            state = restore_state(state, load_checkpoint_file(ckpt_path))
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
        else:
            print(f"[predictor] WARNING: {ckpt_path} missing, random init")
        predictor.variables = variables
        return predictor

    # ------------------------------------------------------------------
    def preprocess(self, images: np.ndarray, K: np.ndarray,
                   bboxes: Optional[np.ndarray] = None):
        """Crop/resize each frame and adjust intrinsics (CPU, native)."""
        B, H, W = images.shape[:3]
        if bboxes is None:
            bboxes = np.tile(np.asarray([0, 0, W, H], np.float32)[None],
                             (B, 1))
        crops = np.empty((B, self.size, self.size, 3), np.uint8)
        same_root = self.root_size == self.size
        crops_root = crops if same_root else np.empty(
            (B, self.root_size, self.root_size, 3), np.uint8)
        K_crops = np.empty((B, 3, 3), np.float32)
        bboxes_strict = np.empty((B, 4), np.float32)
        from horopose_tpu import native
        from PIL import Image
        for i in range(B):
            bbox = RU.get_bbox(bboxes[i], W, H, strict=True)
            bboxes_strict[i] = bbox
            crop = native.crop_resize_bilinear(images[i], bbox, self.size)
            wmin, hmin, wmax, hmax = [int(v) for v in bbox]
            sq = int(max(wmax - wmin, hmax - hmin))
            if crop is None:  # no native toolchain: PIL fallback
                kp_dummy = np.zeros((1, 2))
                square, _, K_sq = RU.resize_image(images[i], bbox, kp_dummy,
                                                  K[i].astype(np.float64))
                crop = np.asarray(Image.fromarray(square).resize(
                    (self.size, self.size), Image.BILINEAR))
                if not same_root:
                    crops_root[i] = np.asarray(Image.fromarray(
                        square).resize((self.root_size, self.root_size),
                                       Image.BILINEAR))
            else:
                K_sq = K[i].astype(np.float64).copy()
                K_sq[0, 2] -= (wmin - int((sq - (wmax - wmin)) // 2))
                K_sq[1, 2] -= (hmin - int((sq - (hmax - hmin)) // 2))
                if not same_root:
                    crops_root[i] = native.crop_resize_bilinear(
                        images[i], bbox, self.root_size)
            crops[i] = crop
            K_crops[i] = RU.get_K_crop_resize_np(
                K_sq, (0.0, 0.0, float(sq), float(sq)), (sq, sq),
                (self.size, self.size))
        # k prior: bbox and fx/fy must come from the SAME frame, exactly as
        # training pairs them (engine.prepare_gt:147-156 — crop bbox with
        # crop K, or original bbox with original K; the pairing makes k
        # frame-invariant). Use the strict ORIGINAL-frame bbox (the one the
        # crop was built from) with the ORIGINAL intrinsics; mixing the
        # original bbox with the crop-frame K_crops scales k by size/sq and
        # biases the predicted root depth by the same bbox-dependent factor.
        fx = np.abs(K[:, 0, 0].astype(np.float32))
        fy = np.abs(K[:, 1, 1].astype(np.float32))
        k_values = np.asarray(k_value_from_bbox(
            jnp.asarray(bboxes_strict), jnp.asarray(fx), jnp.asarray(fy)))
        return crops, crops_root, K_crops, k_values

    def _device_args(self, crops, crops_root, k_values, K_crops):
        """Move inputs to device; under a mesh, replicate the params once
        and shard the batch (padding to data-axis divisibility — the
        pad rows are trimmed from every output in __call__).

        Mesh axes drive the strategy: a 'data' axis splits the batch
        (throughput mode); a 'spatial' axis additionally splits the image
        H dimension, XLA inserting conv halo exchanges over ICI (latency
        mode — the lever when the batch is too small to split, e.g. b=1
        real-time serving; make_mesh(axis_names=("spatial",)) or a hybrid
        ("data", "spatial") grid)."""
        if self.mesh is None:
            return (self.variables, jnp.asarray(crops),
                    jnp.asarray(crops_root), jnp.asarray(k_values),
                    jnp.asarray(K_crops), 0)
        from horopose_tpu.parallel import (data_sharding, replicate,
                                           shard_images)
        if not getattr(self, "_replicated", False):
            self.variables = replicate(self.variables, self.mesh)
            self._replicated = True
        n = dict(zip(self.mesh.axis_names,
                     self.mesh.devices.shape)).get("data", 1)
        pad = (-len(crops)) % n
        if pad:
            crops = np.concatenate([crops, np.repeat(crops[-1:], pad, 0)])
            crops_root = np.concatenate(
                [crops_root, np.repeat(crops_root[-1:], pad, 0)])
            k_values = np.concatenate(
                [k_values, np.repeat(k_values[-1:], pad, 0)])
            K_crops = np.concatenate(
                [K_crops, np.repeat(K_crops[-1:], pad, 0)])
        ds = data_sharding(self.mesh)
        return (self.variables,
                shard_images(np.ascontiguousarray(crops), self.mesh),
                shard_images(np.ascontiguousarray(crops_root), self.mesh),
                jax.device_put(k_values, ds),
                jax.device_put(K_crops, ds), pad)

    def _forward_bucketed(self, crops, crops_root, k_values, K_crops):
        """Forward with cliff-proof batching: pad up the ladder below
        _MAX_CHUNK; above it, launch chunks of _MAX_CHUNK (every batch
        >128 runs the hrnet branch ~35% slower than 128-chunked launches —
        scripts/bench_batch_cliff.py). Outputs trimmed to the true size."""
        B = len(crops)
        if B == 0:
            # run one dummy row and trim: keeps the empty-detection case
            # (upstream detector found no robots) shape-correct without a
            # dedicated b=0 compile
            out = self._forward_bucketed(
                np.zeros((1, *crops.shape[1:]), crops.dtype),
                np.zeros((1, *crops_root.shape[1:]), crops_root.dtype),
                np.ones((1, *k_values.shape[1:]), k_values.dtype),
                np.tile(np.eye(3, dtype=np.float32), (1, 1, 1)))
            return jax.tree.map(lambda a: a[:0], out)
        # under the mesh, chunking would shrink per-device shards instead of
        # helping; keep the single padded launch there
        chunk = _MAX_CHUNK if self.mesh is None else max(B, 1)
        outs = []
        for lo in range(0, B, chunk):
            c = crops[lo:lo + chunk]
            cr = crops_root[lo:lo + chunk]
            kv = k_values[lo:lo + chunk]
            Kc = K_crops[lo:lo + chunk]
            n = len(c)
            target = tiling_friendly_batch(n) if self.mesh is None else n
            if target > n:
                reps = target - n
                c = np.concatenate([c, np.repeat(c[-1:], reps, 0)])
                cr = np.concatenate([cr, np.repeat(cr[-1:], reps, 0)])
                kv = np.concatenate([kv, np.repeat(kv[-1:], reps, 0)])
                Kc = np.concatenate([Kc, np.repeat(Kc[-1:], reps, 0)])
            variables, xd, xrd, kd, Kd, _ = self._device_args(c, cr, kv, Kc)
            out = self._forward(variables, xd, xrd, kd, Kd)
            if xd.shape[0] > n:
                out = jax.tree.map(lambda a: a[:n], out)
            outs.append(out)
        if len(outs) == 1:
            return outs[0]
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)

    def __call__(self, images: np.ndarray, K: np.ndarray,
                 bboxes: Optional[np.ndarray] = None) -> Dict:
        """images (B, H, W, 3) uint8 full frames; K (B, 3, 3); bboxes
        (B, 4) xyxy robot boxes (full frame when omitted)."""
        crops, crops_root, K_crops, k_values = self.preprocess(
            images, K, bboxes)
        out = self._forward_bucketed(crops, crops_root, k_values, K_crops)
        kp3d = np.asarray(out["xyz_fk"])
        kp2d = np.asarray(project_points(jnp.asarray(K, jnp.float32),
                                         jnp.asarray(kp3d)))
        return dict(
            joints=np.asarray(out["pose"]),
            rotation=np.asarray(rot_to_rotmat(out["rot"])),
            translation=np.asarray(out["trans"]),
            root_depth=np.asarray(out["depth"]),
            keypoints_3d=kp3d,
            keypoints_3d_integral=np.asarray(out["xyz_int"]),
            keypoints_2d=kp2d,
        )
