"""Evaluation CLI — the reference `eval.py` surface on TPU.

Loads a checkpoint (--resume, torch .pth.tar accepted via the converter)
and reports ImageNet top-1/top-5.
"""

from __future__ import annotations

import logging
import sys

from .common import parse_args
from .runner import Runner


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s")
    args = parse_args(argv)
    runner = Runner(args, cga_mode=False)
    metrics = runner.evaluate_only()
    print(f"top1: {metrics['top1']:.3f}  top5: {metrics['top5']:.3f}")
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])
