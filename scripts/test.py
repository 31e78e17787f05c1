#!/usr/bin/env python
"""CLI: python scripts/test.py --exp_path experiments/<exp> --dataset <path or name>

Parity target: /root/reference/scripts/test.py:400-409.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from horopose_tpu.config import LOCAL_DATA_DIR  # noqa: E402
from horopose_tpu.pipelines.test import make_test_cfg, test_network  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp_path", type=str, required=True)
    parser.add_argument("--dataset", type=str, required=True,
                        help="test set path, or a DREAM set name under the "
                             "data dir (e.g. panda_synth_test_photo)")
    parser.add_argument("--ckpt", type=str,
                        default="curr_best_auc(add)_model.pk")
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--visualization", action="store_true",
                        help="save best/worst-case skeleton figures")
    args = parser.parse_args()

    dataset = args.dataset
    if not os.path.isdir(dataset):
        for sub in ("synthetic", "real"):
            cand = os.path.join(str(LOCAL_DATA_DIR), "dream", sub, dataset)
            if os.path.isdir(cand):
                dataset = cand
                break
    cfg = make_test_cfg(args.exp_path, dataset)
    test_network(cfg, ckpt_name=args.ckpt, batch_size=args.batch_size,
                 visualization=args.visualization)


if __name__ == "__main__":
    main()
