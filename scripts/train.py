#!/usr/bin/env python
"""CLI entry point: python scripts/train.py --config configs/<robot>/<stage>.yaml

Parity target: /root/reference/scripts/train.py:13-37 — pipeline selection by
boolean flags in the YAML, priority order:
use_rootnet_with_reg_int_shared_backbone > use_rootnet > use_sim2real.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from horopose_tpu.config import make_cfg  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description="Holistic robot pose "
                                                 "estimation training (TPU)")
    parser.add_argument("--config", type=str, required=True,
                        help="path to the experiment YAML")
    args = parser.parse_args()
    # multi-host pods: must run before anything touches jax devices
    # (no-op unless HOROPOSE_DISTRIBUTED / HOROPOSE_COORDINATOR is set)
    from horopose_tpu.parallel.multihost import maybe_initialize
    maybe_initialize()
    cfg = make_cfg(args.config)
    print(f"use config file: {args.config}")
    print(f"experiment: {cfg.exp_name}")

    if cfg.debug_nans:
        from horopose_tpu.core.profiling import enable_debug_nans
        enable_debug_nans(True)

    if cfg.use_rootnet_with_reg_int_shared_backbone:
        from horopose_tpu.pipelines.train_full import train_full
        print("training with full network pipeline (regression + integral "
              "+ rootnet)")
        train_full(cfg)
    elif cfg.use_rootnet:
        from horopose_tpu.pipelines.train_depthnet import train_depthnet
        print("training with depthnet pipeline")
        train_depthnet(cfg)
    elif cfg.use_sim2real:
        from horopose_tpu.pipelines.train_sim2real import train_sim2real
        print("training with self-supervised sim2real pipeline")
        train_sim2real(cfg)
    else:
        raise ValueError("no pipeline selected by the config flags")


if __name__ == "__main__":
    main()
