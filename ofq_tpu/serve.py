"""Inference serving: load a trained experiment and get a jitted predictor.

The reference has no serving story beyond eval.py; for deployment we expose
a small API that reconstructs the model from an experiment directory's
`args.yaml`, restores the best (or latest) checkpoint, and returns a
compiled batch predictor with fixed shapes (one compile, then
`predict(images)` at full device speed).

    from ofq_tpu.serve import Predictor
    p = Predictor.from_experiment("./outputs/w2a2_deit_s", batch_size=64)
    probs = p.predict(images_nhwc)          # (64, 1000) softmax
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml


class Predictor:
    def __init__(self, model, params, *, batch_size: int, img_size: int):
        self.model = model
        self.params = params
        self.batch_size = batch_size
        self.img_size = img_size

        def _predict(params, x):
            logits, _ = model.apply(params, x, train=False)
            return jax.nn.softmax(logits, axis=-1)

        self._fn = jax.jit(_predict)

    @classmethod
    def from_experiment(cls, exp_dir: str, *, batch_size: int = 64,
                        use_best: bool = True) -> "Predictor":
        from .cli.common import build_parser, policy_from_namespace
        from .cli.runner import build_model
        from .train.checkpoint import make_manager, restore_best, restore_latest
        from .train.optim import make_optimizer
        from .train.state import TrainState

        with open(os.path.join(exp_dir, "args.yaml")) as f:
            saved = yaml.safe_load(f)
        args = build_parser().parse_args([])
        for k, v in saved.items():
            if hasattr(args, k):
                setattr(args, k, v)
        policy = policy_from_namespace(args)
        model = build_model(args, policy)

        x = jnp.zeros((batch_size, args.img_size, args.img_size, 3),
                      jnp.float32)
        variables = jax.jit(
            lambda key, xx: model.init({"params": key}, xx, train=False)
        )(jax.random.key(0), x)
        # rebuild the EXACT saved state structure (optimizer chain incl.
        # clipping, EMA, oscillation extra) so orbax restore matches
        tx = make_optimizer(
            lambda _: 0.0, weight_decay=args.weight_decay,
            clip_grad=args.clip_grad, clip_mode=args.clip_mode)
        extra = None
        if getattr(args, "track_oscillation", False):
            from .train.oscillation_hook import init_oscillation_states

            extra = {"oscillation": init_oscillation_states(
                variables["params"], bits=args.wq_bitw,
                qk_reparam=args.qk_reparam, model_type=args.model_type)}
        abstract = jax.eval_shape(
            lambda v: TrainState.create(v, tx, ema=args.model_ema,
                                        extra=extra), variables)
        mgr = make_manager(exp_dir, metric_name=args.eval_metric)
        state = (restore_best(mgr, abstract) if use_best else
                 restore_latest(mgr, abstract)[0])
        if state is None:
            raise FileNotFoundError(f"no checkpoints under {exp_dir}")
        params = state.params
        if args.model_ema and state.ema_params is not None:
            params = {**params, "params": state.ema_params}
        return cls(model, params, batch_size=batch_size,
                   img_size=args.img_size)

    def predict(self, images: np.ndarray) -> np.ndarray:
        """images: (B, H, W, 3) float32 NHWC, already normalized."""
        assert images.shape[0] <= self.batch_size
        pad = self.batch_size - images.shape[0]
        x = jnp.asarray(np.pad(images, ((0, pad), (0, 0), (0, 0), (0, 0))))
        probs = self._fn(self.params, x)
        return np.asarray(probs[: images.shape[0]])


def main(argv=None):
    ap = argparse.ArgumentParser("ofq-serve smoke")
    ap.add_argument("exp_dir")
    ap.add_argument("--batch-size", type=int, default=8)
    a = ap.parse_args(argv)
    p = Predictor.from_experiment(a.exp_dir, batch_size=a.batch_size)
    x = np.random.default_rng(0).normal(
        size=(a.batch_size, p.img_size, p.img_size, 3)).astype(np.float32)
    probs = p.predict(x)
    print("predict ok:", probs.shape, "max prob:", float(probs.max()))


if __name__ == "__main__":
    main()
