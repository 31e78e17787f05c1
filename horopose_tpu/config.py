"""Config system: defaults + YAML overlay with the reference's coercions.

Parity targets:
  /root/reference/lib/core/config.py:8-133   make_default_cfg (~120 keys)
  /root/reference/lib/core/config.py:136-163 make_cfg YAML merge rules
  /root/reference/lib/config.py:10-39        path constants

The user surface is preserved: the same YAML keys drive the same behaviors,
`train.py --config configs/...yaml` selects the pipeline by boolean flags,
and each experiment directory gets a `config.yaml` copy.
"""

from __future__ import annotations

import os
from pathlib import Path

import yaml


class AttrDict(dict):
    """dict with attribute access (stand-in for easydict)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


PROJECT_DIR = Path(__file__).parent.parent
LOCAL_DATA_DIR = Path(os.environ.get("HOROPOSE_DATA_DIR", "data"))
DREAM_DS_DIR = LOCAL_DATA_DIR / "dream"
EXP_DIR = Path(os.environ.get("HOROPOSE_EXP_DIR", "experiments"))
DEPS_DIR = LOCAL_DATA_DIR / "deps"

# user-supplied robot descriptions (fall back to built-ins when absent)
PANDA_DESCRIPTION_PATH = str(DEPS_DIR / "panda-description/panda.urdf")
KUKA_DESCRIPTION_PATH = str(
    DEPS_DIR / "kuka-description/iiwa_description/urdf/iiwa7.urdf")
BAXTER_DESCRIPTION_PATH = str(
    DEPS_DIR / "baxter-description/baxter_description/urdf/baxter.urdf")

URDF_PATHS = {
    "panda": PANDA_DESCRIPTION_PATH,
    "kuka": KUKA_DESCRIPTION_PATH,
    "baxter": BAXTER_DESCRIPTION_PATH,
}


def resolve_urdf_path(robot_type: str) -> str | None:
    """User deps URDF if present, else None (Robot falls back to built-in)."""
    p = URDF_PATHS.get(robot_type)
    return p if p and os.path.exists(p) else None


def make_default_cfg() -> AttrDict:
    cfg = AttrDict()
    cfg.exp_name = "default"
    cfg.config_path = "default"

    # training
    cfg.no_cuda = False
    cfg.device_id = 0
    cfg.batch_size = 64
    cfg.epoch_size = 104950
    cfg.n_epochs = 700
    cfg.n_dataloader_workers = int(os.environ.get("N_CPUS", 10)) - 2
    cfg.clip_gradient = 10.0

    # data
    cfg.urdf_robot_name = "panda"
    cfg.train_ds_names = os.path.abspath(
        str(LOCAL_DATA_DIR / "dream/real/panda_synth_train_dr"))
    cfg.image_size = 256.0

    # augmentation
    cfg.jitter = True
    cfg.other_aug = True
    cfg.occlusion = True
    cfg.occlu_p = 0.5
    cfg.padding = False
    cfg.fix_truncation = False
    cfg.truncation_padding = [120, 120, 120, 120]
    cfg.rootnet_flip = False

    # pipeline selection
    cfg.use_rootnet = False
    cfg.use_rootnet_with_reg_int_shared_backbone = False
    cfg.use_sim2real = False
    cfg.use_sim2real_real = False
    cfg.pretrained_rootnet = None
    cfg.pretrained_weight_on_synth = None
    # ImageNet backbone init (reference full_net.py:413-415 hardcodes
    # torchvision/pose-HRNet downloads; here the artifacts are explicit
    # paths: a tools/convert .msgpack or a raw torch .pth)
    cfg.backbone_pretrained = None
    cfg.rootnet_backbone_pretrained = None
    cfg.use_view = False
    cfg.known_joint = False

    # optimizer / schedule
    cfg.lr = 1e-4
    cfg.weight_decay = 0.0
    cfg.use_schedule = False
    cfg.schedule_type = ""
    cfg.n_epochs_warmup = 0
    cfg.start_decay = 100
    cfg.end_decay = 200
    cfg.final_decay = 0.01
    cfg.exponent = 1.0
    cfg.step_decay = 0.1
    cfg.step = 5

    # model
    cfg.backbone_name = "resnet50"
    cfg.rootnet_backbone_name = "hrnet32"
    # None = follow cfg.image_size at USE time (pipelines/common.crop_sizes);
    # a default-time tuple would go stale when image_size is overridden later
    cfg.rootnet_image_size = None
    cfg.other_image_size = None
    cfg.n_iter = 4
    cfg.p_dropout = 0.5
    cfg.use_rpmg = False
    cfg.reg_joint_map = False
    cfg.joint_conv_dim = []
    cfg.rotation_dim = 6
    cfg.direct_reg_rot = False
    cfg.rot_iterative_matmul = False
    cfg.fix_root = True
    cfg.reg_from_bb_out = False
    cfg.depth_from_bb_out = False
    cfg.bbox_3d_shape = [1300, 1300, 1300]
    cfg.reference_keypoint_id = 3
    cfg.resample = False
    cfg.use_origin_bbox = False
    cfg.use_extended_bbox = True
    cfg.extend_ratio = [0.2, 0.13]
    cfg.use_offset = False
    cfg.use_rootnet_xy_branch = False
    cfg.add_fc = False
    cfg.multi_kp = False
    cfg.kps_need_depth = None

    # losses
    cfg.pose_loss_func = "mse"
    cfg.rot_loss_func = "mse"
    cfg.trans_loss_func = "l2norm"
    cfg.uv_loss_func = "l2norm"
    cfg.depth_loss_func = "l1"
    cfg.kp3d_loss_func = "l2norm"
    cfg.kp2d_loss_func = "l2norm"
    cfg.kp3d_int_loss_func = "l2norm"
    cfg.kp2d_int_loss_func = "l2norm"
    cfg.align_3d_loss_func = "l2norm"
    cfg.pose_loss_weight = 0.0
    cfg.rot_loss_weight = 0.0
    cfg.trans_loss_weight = 0.0
    cfg.uv_loss_weight = 0.0
    cfg.depth_loss_weight = 0.0
    cfg.kp2d_loss_weight = 0.0
    cfg.kp3d_loss_weight = 0.0
    cfg.kp2d_int_loss_weight = 0.0
    cfg.kp3d_int_loss_weight = 0.0
    cfg.align_3d_loss_weight = 0.0
    cfg.joint_individual_weights = None
    cfg.use_joint_valid_mask = False
    cfg.fix_mask = False
    cfg.rootnet_depth_loss_weight = 1.0
    cfg.xy_loss_func = "l1"
    cfg.allow_random_teacher = False  # sim2real hard-fails on a missing
    #                                   seg teacher unless explicitly allowed
    cfg.allow_random_init = False     # ... and on missing synth-pretrained
    #                                   weights (train_sim2real.py:100-102)
    cfg.mask_loss_func = "mse_mean"
    cfg.mask_loss_weight = 0.0
    cfg.scale_loss_weight = 0.0
    cfg.iou_loss_weight = 0.0

    # resume
    cfg.resume_run = False
    cfg.resume_experiment_name = "resume_name"

    # TPU-native extensions (defaults keep reference behavior)
    cfg.mesh_shape = None          # e.g. [8] for 8-way data parallelism
    cfg.compute_dtype = "float32"  # or "bfloat16" for backbone compute
    cfg.remat = False              # jax.checkpoint per backbone block: the
    #                                backward recomputes block internals
    #                                instead of storing them (fits bigger
    #                                training batches at ~extra fwd FLOPs)
    cfg.debug_nans = False         # jax NaN tripwire (reference keeps torch
    #                                anomaly detection always-on)
    cfg.profile_dir = None         # write an XLA profiler trace here
    cfg.decode_cache = False       # memmap decoded-jpg cache (data/cache.py):
    #                                epoch 1 fills, later epochs skip decode
    cfg.decode_cache_dir = ""      # cache root; "" = HOROPOSE_CACHE_DIR env
    #                                or <dataset_dir>/.decode_cache
    cfg.prefetch_batches = 2       # train loops stage this many batches
    #                                onto device ahead of the step (async
    #                                device_put overlaps host->device
    #                                transfer with compute); 0 disables
    cfg.raster_faces_per_tile = "auto"  # sim2real rasterizer tile budget:
    #                                "auto" = measured-best per mesh size
    #                                (ops/rasterizer.resolve_faces_per_tile),
    #                                int > 0 = explicit, 0 = dense renderer
    return cfg


def make_cfg(config_path: str) -> AttrDict:
    """Overlay a YAML file with the reference's per-key coercion rules."""
    cfg = make_default_cfg()
    cfg.config_path = str(config_path)
    with open(config_path, encoding="utf-8") as f:
        overrides = yaml.safe_load(f.read()) or {}
    for k, v in overrides.items():
        if k not in cfg:
            continue
        if k == "n_dataloader_workers":
            cfg[k] = min(cfg[k], v)
        elif k == "train_ds_names":
            cfg[k] = os.path.abspath(str(LOCAL_DATA_DIR / v))
            if "move" in str(v):
                cfg[k] = v
        elif k in ("lr", "exponent") or k.endswith("loss_weight"):
            cfg[k] = float(v)
        elif k in ("joint_individual_weights", "pretrained_rootnet",
                   "pretrained_weight_on_synth", "backbone_pretrained",
                   "rootnet_backbone_pretrained"):
            cfg[k] = None if v == "None" else v
        elif k == "extend_ratio":
            cfg[k] = list(v)
        else:
            cfg[k] = v
    return cfg
