"""Shared pipeline plumbing: datasets, robot/model construction, seeding.

Parity target: /root/reference/lib/utils/utils.py:63-144 (get_dataloaders)
— train set from cfg.train_ds_names, test sets derived by the
train_dr -> test_dr / test_photo naming convention, plus the 4 real Panda
camera sets when they exist on disk.
"""

from __future__ import annotations

import os
import random
from typing import Dict

import numpy as np

from horopose_tpu import constants as C
from horopose_tpu.config import resolve_urdf_path
from horopose_tpu.data import DataLoader, DreamDataset, PartialSampler
from horopose_tpu.kinematics import Robot
from horopose_tpu.models import FullNet

REAL_DS_SHORTS = ("azure", "kinect", "realsense", "orb")


def make_pnp_fn(ds_names):
    """Pseudo-GT rotation for REAL datasets: PnP of the annotated 2D
    keypoints against FK 3D points. Returns None on synthetic sets, where
    TCO is the rotation ground truth.

    Takes the dataset-name string explicitly because the reference keys the
    condition differently per harness: training/validation key on
    train_ds_names (/root/reference/lib/core/function.py:67), while the test
    harness keys on the dataset under evaluation
    (/root/reference/scripts/test.py:120-125)."""
    if "synth" in str(ds_names):
        return None
    from horopose_tpu.ops.pnp import pnp
    return pnp


def set_seed(seed: int = C.GLOBAL_SEED):
    random.seed(seed)
    np.random.seed(seed)


def jit_init(model, rng, *args, train=False):
    """model.init under jit: one compiled executable instead of thousands
    of tiny op dispatches. On remote-PJRT backends (the axon tunnel) every
    un-jitted op is a network round trip, which turns an eager flagship
    init into >10 minutes; jitted it is seconds (bench.py:46-52 pattern).
    Weights are identical either way (same PRNG stream)."""
    import jax

    def _init(r, *a):
        return model.init({"params": r, "dropout": r}, *a, train=train)

    return jax.jit(_init)(rng, *args)


def make_robot(cfg) -> Robot:
    return Robot(cfg.urdf_robot_name,
                 urdf_path=resolve_urdf_path(cfg.urdf_robot_name))


def build_fullnet(cfg) -> FullNet:
    import jax.numpy as jnp
    robot_type = cfg.urdf_robot_name
    dtype = jnp.bfloat16 if str(cfg.get("compute_dtype", "float32")) == \
        "bfloat16" else jnp.float32
    # the model's heatmap/uv geometry follows the OTHER (regression) crop
    # (reference: self.image_size = args.other_image_size, full_net.py:62)
    _, other_hw = crop_sizes(cfg)
    return FullNet(
        dtype=dtype,
        robot_type=robot_type,
        dof=C.DOF[robot_type],
        num_keypoints=C.NUM_KEYPOINTS[robot_type],
        backbone_name=cfg.backbone_name,
        rootnet_backbone_name=cfg.rootnet_backbone_name,
        image_size=other_hw[0],
        bbox_3d_shape=tuple(cfg.bbox_3d_shape),
        reference_keypoint_id=int(cfg.reference_keypoint_id),
        fix_root=bool(cfg.fix_root),
        n_iter=int(cfg.n_iter),
        p_dropout=float(cfg.p_dropout),
        rotation_dim=int(cfg.rotation_dim),
        direct_reg_rot=bool(cfg.direct_reg_rot),
        rot_iterative_matmul=bool(cfg.rot_iterative_matmul),
        reg_joint_map=bool(cfg.reg_joint_map),
        joint_conv_dim=tuple(cfg.joint_conv_dim) or (256, 256, 256),
        joint_bounds=C.JOINT_BOUNDS[robot_type] if cfg.reg_joint_map else None,
        add_fc=bool(cfg.add_fc),
        remat=bool(cfg.get("remat", False)),
        multi_kp=bool(cfg.multi_kp),
        kps_need_depth=tuple(cfg.kps_need_depth) if cfg.kps_need_depth
        else None,
        init_pose=tuple(C.initial_joint_vector(
            "mean", robot_type).tolist()),
        # identity rotation in the configured representation
        # (reference: rotmat_to_rot6d/quat of eye(3), full_net.py:186-189)
        init_rot=(1.0, 0.0, 0.0, 0.0) if int(cfg.rotation_dim) == 4
        else (1.0, 0.0, 0.0, 0.0, 1.0, 0.0),
    )


def apply_pretrained_backbone(state, weights_path: str, backbone_name: str,
                              dst_key: str, tag: str = ""):
    """Initialize one backbone subtree from pretrained (ImageNet) weights.

    Reference parity: the reg backbone is ALWAYS initialized from ImageNet
    (full_net.py:413-415 -> Resnet.py:69-92 / HRnet.py:572-603, loaded with
    strict=False); paper-level accuracy depends on it. Here the artifact is a
    cfg path (converted .msgpack or raw torch .pth), loaded through
    tools/torch_weights and grafted leniently under params[dst_key].
    """
    from horopose_tpu.tools.torch_weights import (lenient_merge,
                                                  load_backbone_weights)
    p_sub, bs_sub = load_backbone_weights(weights_path, backbone_name)
    params = dict(state.params)
    if dst_key not in params:
        raise KeyError(
            f"no backbone subtree {dst_key!r} in params "
            f"(have {sorted(params)})")
    params[dst_key], n_p, skipped_p = lenient_merge(params[dst_key], p_sub)
    if n_p == 0:
        raise ValueError(
            f"pretrained backbone {weights_path!r} matched ZERO leaves of "
            f"{dst_key!r} — wrong backbone_name or artifact?")
    bs = dict(state.batch_stats) if state.batch_stats else {}
    n_b = 0
    if dst_key in bs and bs_sub:
        bs[dst_key], n_b, _ = lenient_merge(bs[dst_key], bs_sub)
    print(f"[pretrained{tag}] {weights_path} -> {dst_key}: "
          f"{n_p} params + {n_b} batch_stats leaves loaded, "
          f"{len(skipped_p)} skipped")
    return state.replace(params=params, batch_stats=bs)


def _resolve_cache_dir(cfg, path) -> str:
    """Per-dataset decode-cache directory (cache contents depend only on
    the jpgs, so the key is just the dataset's name)."""
    if not cfg.get("decode_cache"):
        return ""
    root = str(cfg.get("decode_cache_dir") or
               os.environ.get("HOROPOSE_CACHE_DIR") or
               os.path.join(str(path), ".decode_cache"))
    root_abs, path_abs = os.path.abspath(root), os.path.abspath(str(path))
    # separator-boundary containment: /data/dream-v2 is NOT inside
    # /data/dream (a bare startswith would say it is)
    if root_abs == path_abs or root_abs.startswith(path_abs + os.sep):
        return root  # already inside the dataset dir: no name needed
    return os.path.join(root, os.path.basename(os.path.normpath(str(path))))


def _size_hw(value, fallback) -> tuple:
    """Normalize a size knob (scalar / (h, w) / None) to an int pair."""
    if value is None:
        value = fallback
    if isinstance(value, (tuple, list)):
        return (int(value[0]), int(value[1]))
    return (int(value), int(value))


def crop_sizes(cfg) -> tuple:
    """(rootnet_hw, other_hw) — the reference sizes the two crops
    independently (utils.py:77-78 rootnet_image_size / other_image_size);
    both default to cfg.image_size.

    Non-square crops are rejected: FullNet's heatmap geometry assumes
    square (heatmap_size = image_size // 4 drives both height_dim and
    width_dim, models/full_net.py) — a rectangular size would silently
    decode the heatmap with the wrong width geometry."""
    sizes = (_size_hw(cfg.get("rootnet_image_size"), cfg.image_size),
             _size_hw(cfg.get("other_image_size"), cfg.image_size))
    for tag, (h, w) in zip(("rootnet_image_size", "other_image_size"), sizes):
        if h != w:
            raise ValueError(
                f"{tag}=({h},{w}) is non-square; FullNet assumes square "
                "crops (heatmap geometry is image_size//4 in both axes)")
    return sizes


def _mk_dataset(cfg, path, train: bool) -> DreamDataset:
    rootnet_hw, other_hw = crop_sizes(cfg)
    return DreamDataset(
        path,
        decode_cache_dir=_resolve_cache_dir(cfg, path),
        padding=bool(cfg.get("padding")),
        rootnet_resize_hw=rootnet_hw,
        other_resize_hw=other_hw,
        color_jitter=cfg.jitter if train else False,
        rgb_augmentation=cfg.other_aug if train else False,
        occlusion_augmentation=cfg.occlusion if train else False,
        occlu_p=cfg.occlu_p,
        extend_ratio=cfg.extend_ratio,
        flip=cfg.rootnet_flip if train else False,
        process_truncation=bool(cfg.fix_truncation),
        truncation_padding=tuple(cfg.truncation_padding),
    )


def get_dataloaders(cfg) -> Dict:
    """Build train loader + {dsname: eval loader}. Eval sets that are not on
    disk are skipped (the fabricated-fixture workflow and partial DREAM
    downloads both rely on this)."""
    train_path = cfg.train_ds_names
    robot = cfg.urdf_robot_name
    out: Dict = {"test": {}}

    ds_train = _mk_dataset(cfg, train_path, train=True)
    if len(ds_train) == 0:
        raise FileNotFoundError(
            f"no DREAM samples (*.jpg + *.json) found under {train_path!r}; "
            "set HOROPOSE_DATA_DIR or fix train_ds_names in the config")
    sampler = PartialSampler(ds_train, cfg.epoch_size)
    # multi-host pods: cfg.batch_size stays GLOBAL; each process loads its
    # rank-strided slice of the same permutation and 1/N of every batch
    # (parallel/multihost.py; shard_batch assembles the global arrays)
    from horopose_tpu.parallel.multihost import (DistributedSampler,
                                                 local_batch_size,
                                                 process_count,
                                                 process_index)
    n_proc = process_count()
    batch_size = local_batch_size(cfg.batch_size)
    # distinct augmentation streams per host (workers reseed from this)
    worker_seed = 808 + 100_000 * process_index()
    if cfg.get("resample"):
        # weighted resampling (train_depthnet.py:62-64); weights file is a
        # user-supplied artifact
        weights_path = os.path.join("unit_test", "z_weights.npy")
        if os.path.exists(weights_path):
            from horopose_tpu.data.samplers import WeightedRandomSampler
            weights = np.load(weights_path)
            sampler = WeightedRandomSampler(
                weights, num_samples=min(cfg.epoch_size, len(ds_train)))
        else:
            print(f"[data] resample=True but {weights_path} missing; "
                  "falling back to uniform sampling")
    if n_proc > 1:
        sampler = DistributedSampler(sampler)
    out["train"] = DataLoader(ds_train, batch_size=batch_size,
                              sampler=sampler,
                              num_workers=cfg.n_dataloader_workers,
                              drop_last=True, worker_seed=worker_seed)
    if len(out["train"]) == 0:
        # drop_last + a sampler shorter than one batch = silent no-op
        # epochs (loss meters log 0.0); name the cause loudly
        print(f"[data] WARNING: zero train batches per epoch — sampler "
              f"yields {len(sampler)} indices (epoch_size={cfg.epoch_size}, "
              f"dataset={len(ds_train)}) < batch_size {batch_size}; "
              "every epoch will be a no-op")
    out["train_dataset"] = ds_train

    candidates = {"dr": train_path.replace("train_dr", "test_dr")}
    if robot != "baxter":
        candidates["photo"] = train_path.replace("train_dr", "test_photo")
    if robot == "panda":
        for short in REAL_DS_SHORTS:
            candidates[short] = os.path.join(
                os.path.dirname(os.path.dirname(train_path)),
                "real", f"panda-3cam_{short}" if short != "orb"
                else "panda-orb")
    for name, path in candidates.items():
        if os.path.isdir(path) and os.path.abspath(path) != \
                os.path.abspath(train_path):
            ds = _mk_dataset(cfg, path, train=False)
            if len(ds):
                # multi-process eval: rank-strided with wrap-around padding
                # so every process runs the SAME number of eval batches
                # (the validate loops' to_host allgathers are collectives)
                eval_sampler = None
                if n_proc > 1:
                    from horopose_tpu.data.samplers import ListSampler
                    eval_sampler = DistributedSampler(
                        ListSampler(range(len(ds))), pad=True)
                out["test"][name] = DataLoader(
                    ds, batch_size=batch_size, sampler=eval_sampler,
                    num_workers=cfg.n_dataloader_workers, drop_last=False)
    return out
