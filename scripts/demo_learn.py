#!/usr/bin/env python
"""End-to-end learning proof: train the flagship pipeline on RENDERED
synthetic data and watch held-out ADD AUC rise.

Everything is self-contained: the script fabricates a DREAM-format dataset
whose images are flat-shaded renders of the robot at the annotated pose
(tools/synth_dream.py render_images=True), trains via the real
`pipelines.train_full` CLI path, then replays the real eval harness
(`pipelines.test`) on the best checkpoint. This exercises the full user
surface — config YAML -> loaders -> donated jitted train step -> validate
battery -> best-AUC keeper -> summary.txt — with pixels that actually
carry the pose signal, so the metrics move (unlike noise fixtures, where
ADD AUC is stuck at 0 by construction).

Usage (TPU or CPU):
    python scripts/demo_learn.py --workdir /tmp/horopose_demo \
        --n-train 512 --n-test 64 --epochs 30 --batch-size 32

Dataset generation runs in a subprocess pinned to CPU (the remote-TPU
tunnel must not leak into children: they scrub PALLAS_AXON_POOL_IPS and
set JAX_PLATFORMS=cpu).
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIG_TEMPLATE = """\
exp_name : "{exp_name}"
urdf_robot_name : "{robot}"
train_ds_names : "dream/synthetic/{robot}_synth_train_dr"
image_size : 256.0
backbone_name : "{backbone}"
rootnet_backbone_name : "{rootnet_backbone}"
lr : {lr}
weight_decay : 0.
use_schedule : {use_schedule}
schedule_type : "exponential"
n_epochs_warmup : 0
start_decay : {start_decay}
end_decay : {end_decay}
final_decay : 0.01
exponent : 0.95
batch_size : {batch_size}
epoch_size : {epoch_size}
n_epochs : {epochs}
n_dataloader_workers : 4
clip_gradient : 5.0
n_iter : 4
pose_loss_func : "mse"
rot_loss_func : "mse"
trans_loss_func : "l2norm"
depth_loss_func : "l1"
uv_loss_func : "l2norm"
kp2d_loss_func : "l2norm"
kp3d_loss_func : "l2norm"
kp2d_int_loss_func : "l2norm"
kp3d_int_loss_func : "l2norm"
align_3d_loss_func : "l2norm"
pose_loss_weight : 1.0
rot_loss_weight : 1.0
trans_loss_weight : 1.0
depth_loss_weight : 10.0
uv_loss_weight : 1.0
kp2d_loss_weight : 10.0
kp3d_loss_weight : 10.0
kp2d_int_loss_weight : 10.0
kp3d_int_loss_weight : 10.0
align_3d_loss_weight : 0.0
joint_individual_weights : None
use_joint_valid_mask : False
fix_root : True
bbox_3d_shape :
  - 1300
  - 1300
  - 1300
reference_keypoint_id : 3
use_rootnet : True
rootnet_depth_loss_weight : 1.0
use_rootnet_xy_branch : False
pretrained_rootnet : None
use_origin_bbox : False
use_extended_bbox : True
use_rootnet_with_reg_int_shared_backbone : True
resume_run : False
resume_experiment_name : "none"
"""


def generate(workdir, robot, n_train, n_test, hw, view_mode):
    from horopose_tpu.tools.synth_dream import make_synthetic_dream_dataset
    base = os.path.join(workdir, "data", "dream")
    done = os.path.join(workdir, "data", ".generated.json")
    want = {"robot": robot, "n_train": n_train, "n_test": n_test,
            "hw": list(hw), "view_mode": view_mode}
    if os.path.exists(done) and json.load(open(done)) == want:
        print(f"[demo] datasets already generated under {base}")
        return
    print(f"[demo] rendering {n_train} train + {n_test} test images ...")
    make_synthetic_dream_dataset(base, robot, n_images=n_train, seed=1000,
                                 image_hw=hw, split="train_dr",
                                 render_images=True, view_mode=view_mode)
    make_synthetic_dream_dataset(base, robot, n_images=n_test, seed=2000,
                                 image_hw=hw, split="test_dr",
                                 render_images=True, view_mode=view_mode)
    with open(done, "w") as f:
        json.dump(want, f)
    print("[demo] datasets ready")


def auc_progression(exp_dir):
    """Parse per-epoch held-out AUCs from the experiment's scalars.jsonl."""
    path = os.path.join(exp_dir, "log", "scalars.jsonl")
    rows = {}
    if not os.path.exists(path):
        return rows
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            if r["tag"].startswith("Val/AUC_ADD_"):
                rows.setdefault(int(r["step"]), {})[
                    r["tag"].split("Val/AUC_ADD_")[1]] = r["value"]
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/horopose_demo")
    p.add_argument("--robot", default="panda")
    p.add_argument("--n-train", type=int, default=512)
    p.add_argument("--n-test", type=int, default=64)
    p.add_argument("--image-hw", type=int, nargs=2, default=(480, 640))
    p.add_argument("--view-mode", default="upright",
                   choices=("upright", "random"),
                   help="dataset viewpoint regime (synth_dream.py)")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--rootnet-backbone", default="hrnet32")
    p.add_argument("--exp-name", default="demo_learn")
    p.add_argument("--cpu", action="store_true",
                   help="pin the training run to CPU too")
    p.add_argument("--skip-eval", action="store_true")
    p.add_argument("--generate-only", action="store_true",
                   help="(internal) dataset-generation child process")
    args = p.parse_args()

    os.makedirs(args.workdir, exist_ok=True)

    if args.generate_only:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        generate(args.workdir, args.robot, args.n_train, args.n_test,
                 tuple(args.image_hw), args.view_mode)
        return

    # 1) fabricate datasets in a CPU-pinned child (before this process
    #    opens the TPU tunnel)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    subprocess.run([sys.executable, os.path.abspath(__file__),
                    "--generate-only", "--workdir", args.workdir,
                    "--robot", args.robot, "--n-train", str(args.n_train),
                    "--n-test", str(args.n_test),
                    "--view-mode", args.view_mode,
                    "--image-hw", str(args.image_hw[0]),
                    str(args.image_hw[1])],
                   env=env, check=True)

    # 2) point the framework at the demo tree and train via the CLI path
    os.environ["HOROPOSE_DATA_DIR"] = os.path.join(args.workdir, "data")
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    os.chdir(args.workdir)

    cfg_path = os.path.join(args.workdir, f"{args.exp_name}.yaml")
    use_schedule = args.epochs > 20
    with open(cfg_path, "w") as f:
        f.write(CONFIG_TEMPLATE.format(
            exp_name=args.exp_name, robot=args.robot,
            backbone=args.backbone, rootnet_backbone=args.rootnet_backbone,
            lr=args.lr, batch_size=args.batch_size,
            epoch_size=args.n_train, epochs=args.epochs,
            use_schedule=use_schedule,
            start_decay=max(args.epochs // 2, 1), end_decay=args.epochs))

    from horopose_tpu.config import make_cfg
    from horopose_tpu.pipelines.train_full import train_full
    cfg = make_cfg(cfg_path)
    print(f"[demo] training {args.epochs} epochs x "
          f"{args.n_train // args.batch_size} steps @b{args.batch_size}")
    train_full(cfg)

    exp_dir = os.path.join(args.workdir, "experiments", args.exp_name)
    rows = auc_progression(exp_dir)
    print("\n[demo] held-out ADD AUC progression (epoch -> auc):")
    for ep in sorted(rows):
        print(f"  epoch {ep:3d}: " + "  ".join(
            f"{k}={v:.4f}" for k, v in sorted(rows[ep].items())))

    # 3) replay the real eval harness on the best checkpoint
    ckpt = os.path.join(exp_dir, "ckpt", "curr_best_auc(add)_model.pk")
    if args.skip_eval:
        return
    if not os.path.exists(ckpt):
        print("[demo] no best checkpoint was saved (AUC never improved) — "
              "skipping the eval-harness replay")
        return
    from horopose_tpu.pipelines.test import make_test_cfg, test_network
    test_ds = os.path.join(args.workdir, "data", "dream", "synthetic",
                           f"{args.robot}_synth_test_dr")
    tcfg = make_test_cfg(exp_dir, test_ds)
    test_network(tcfg, ckpt_name=ckpt,
                 batch_size=min(args.batch_size, args.n_test))
    summary = os.path.join(exp_dir, "result", "summary.txt")
    if os.path.exists(summary):
        print("\n[demo] result/summary.txt:")
        print(open(summary).read())


if __name__ == "__main__":
    main()
