#!/usr/bin/env python
"""CLI: convert PyTorch weight artifacts to horopose_tpu msgpack trees.

Usage:
  python -m horopose_tpu.tools.convert ctrnet_seg azure.pth models/panda_segmentation/azure.msgpack
  python -m horopose_tpu.tools.convert fullnet curr_best_auc\\(add\\)_model.pk out.pk \\
      --backbone resnet50 --rootnet_backbone hrnet32
  python -m horopose_tpu.tools.convert resnet50 resnet50-imagenet.pth out.msgpack
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from horopose_tpu.tools.torch_weights import (convert_ctrnet_seg,
                                              convert_fullnet_reference_checkpoint,
                                              convert_hrnet, convert_resnet,
                                              load_torch_file, merge_into,
                                              save_msgpack)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["resnet18", "resnet34", "resnet50",
                                    "hrnet32", "ctrnet_seg", "fullnet",
                                    "depthnet"])
    p.add_argument("src", help=".pth/.pk torch checkpoint")
    p.add_argument("dst", help="output .msgpack path")
    p.add_argument("--backbone", default="resnet50")
    p.add_argument("--rootnet_backbone", default="hrnet32")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--pred_xy", action="store_true")
    p.add_argument("--use_offset", action="store_true")
    p.add_argument("--add_fc", action="store_true")
    args = p.parse_args()

    sd = load_torch_file(args.src)
    print(f"loaded {len(sd)} tensors from {args.src}")
    rng = jax.random.PRNGKey(0)

    if args.kind.startswith("resnet"):
        from horopose_tpu.models.resnet import RESNET_SPECS, get_resnet
        block, sizes = RESNET_SPECS[args.kind]
        model = get_resnet(args.kind)
        variables = model.init(rng, jnp.zeros((1, 64, 64, 3)), train=False)
        tb = convert_resnet(sd, sizes, block == "bottleneck")
    elif args.kind == "hrnet32":
        from horopose_tpu.models.hrnet import get_hrnet
        model = get_hrnet(32)
        variables = model.init(rng, jnp.zeros((1, 64, 64, 3)), train=False)
        tb = convert_hrnet(sd)
    elif args.kind == "ctrnet_seg":
        from horopose_tpu.models.deeplab import KeypointSegNet
        model = KeypointSegNet()
        variables = model.init(rng, jnp.zeros((1, 240, 320, 3)),
                               train=False)
        tb = convert_ctrnet_seg(sd)
    elif args.kind == "depthnet":
        from horopose_tpu.models.depth_net import RootNet
        from horopose_tpu.tools.torch_weights import \
            convert_rootnet_reference_checkpoint
        model = RootNet(backbone_name=args.backbone, pred_xy=args.pred_xy,
                        use_offset=args.use_offset, add_fc=args.add_fc,
                        input_size=args.image_size)
        s = args.image_size
        variables = model.init(rng, jnp.zeros((1, s, s, 3)),
                               jnp.ones((1,)), train=False)
        tb = convert_rootnet_reference_checkpoint(sd, args.backbone)
    else:  # fullnet
        from horopose_tpu.pipelines.common import build_fullnet
        from horopose_tpu.config import make_default_cfg
        cfg = make_default_cfg()
        cfg.backbone_name = args.backbone
        cfg.rootnet_backbone_name = args.rootnet_backbone
        cfg.image_size = float(args.image_size)
        model = build_fullnet(cfg)
        s = args.image_size
        variables = model.init({"params": rng, "dropout": rng},
                               jnp.zeros((1, s, s, 3)),
                               jnp.zeros((1, s, s, 3)), jnp.ones((1,)),
                               jnp.eye(3)[None], train=False)
        tb = convert_fullnet_reference_checkpoint(
            sd, args.backbone, args.rootnet_backbone)

    new_vars = merge_into(variables, tb)
    save_msgpack(new_vars, args.dst)
    n = sum(1 for _ in jax.tree.leaves(tb.params))
    print(f"converted {n} parameter leaves -> {args.dst}")


if __name__ == "__main__":
    main()
