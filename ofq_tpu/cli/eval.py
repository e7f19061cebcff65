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
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
        force=True)  # absl/tf grab the root logger before us
    from ..parallel import initialize_multihost

    initialize_multihost()  # no-op off-pod; must precede any backend use
    args = parse_args(argv)
    import jax

    # Checkpoint-parity evals default to full-precision matmuls: the MXU's
    # default f32 path truncates operands to bf16 (~0.4% value error),
    # which can shift top-1 beyond the 0.1% parity budget.
    precision = args.matmul_precision or "highest"
    jax.config.update("jax_default_matmul_precision", precision)
    runner = Runner(args, cga_mode=False)
    metrics = runner.evaluate_only()
    print(f"top1: {metrics['top1']:.3f}  top5: {metrics['top5']:.3f}")
    return metrics


if __name__ == "__main__":
    main(sys.argv[1:])
