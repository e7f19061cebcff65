"""CGA finetune CLI — the reference `cga.py` surface on TPU.

Loads a phase-1 checkpoint (--resume / --initial-checkpoint), pins the LR
at the cooldown min_lr (reference cga.py:760-762), and trains
`--freeze_for_n_epochs` epochs with the confidence-guided-annealing
freeze/restore transform active in the jitted step.
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
    if args.resume and not args.initial_checkpoint:
        args.initial_checkpoint = args.resume
        args.resume = ""
    runner = Runner(args, cga_mode=True)
    best = runner.fit()
    print(f"best top1: {best['top1']:.3f} (epoch {best['epoch']})")
    return best


if __name__ == "__main__":
    main(sys.argv[1:])
