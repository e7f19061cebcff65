"""QAT training CLI — the reference `train.py` surface on TPU.

Usage (mirrors train_scripts/*):
  python -m ofq_tpu.cli.train -c configs/deit_imagenet_qat.yml <data_dir> \
      --model deit_small_distilled_patch16_224 --wq-enable --wq-bitw 2 ...
"""

from __future__ import annotations

import logging
import sys

from .common import parse_args
from .runner import Runner


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
        force=True)  # absl/tf grab the root logger before us
    from ..parallel import initialize_multihost

    initialize_multihost()  # no-op off-pod; must precede any backend use
    args = parse_args(argv)
    if args.matmul_precision:
        import jax

        jax.config.update("jax_default_matmul_precision",
                          args.matmul_precision)
    runner = Runner(args, cga_mode=False)
    best = runner.fit()
    print(f"best top1: {best['top1']:.3f} (epoch {best['epoch']})")
    return best


if __name__ == "__main__":
    main(sys.argv[1:])
