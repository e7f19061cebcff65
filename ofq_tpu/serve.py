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
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml


class Predictor:
    def __init__(self, model, params, *, batch_size: int, img_size: int,
                 epoch: Optional[int] = None):
        self.model = model
        self.params = params
        self.batch_size = batch_size
        self.img_size = img_size
        # the restored checkpoint's epoch (None for artifact-built
        # predictors) — consumed e.g. by convert.torch_export's .pth.tar
        # epoch stamp
        self.epoch = epoch

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
                   img_size=args.img_size, epoch=int(state.epoch))

    def predict(self, images: np.ndarray) -> np.ndarray:
        """images: (B, H, W, 3) float32 NHWC, already normalized."""
        assert images.shape[0] <= self.batch_size
        pad = self.batch_size - images.shape[0]
        x = jnp.asarray(np.pad(images, ((0, pad), (0, 0), (0, 0), (0, 0))))
        probs = self._fn(self.params, x)
        return np.asarray(probs[: images.shape[0]])


def export_experiment(exp_dir: str, out_path: str, *,
                      use_best: bool = True) -> str:
    """Freeze a trained experiment into a packed-integer deployment
    artifact (see ofq_tpu.deploy): int codes for every quantized kernel,
    fp32 passthrough for the rest, one .npz file."""
    from .cli.common import build_parser
    from .deploy import artifact_nbytes, export_packed

    with open(os.path.join(exp_dir, "args.yaml")) as f:
        saved = yaml.safe_load(f)
    args = build_parser().parse_args([])
    for k, v in saved.items():
        if hasattr(args, k):
            setattr(args, k, v)
    if not (args.wq_enable and args.aq_enable):
        # wq-off/aq-on is the dangerous corner: QLinear kernels then carry
        # the input_quant marker, so export_packed would StatsQ-pack
        # never-quantized fp32 kernels at wq_bitw bits, silently producing
        # an artifact whose logits diverge from the trained model.
        raise NotImplementedError(
            "packed export needs BOTH weight and activation quantizers "
            "enabled (wq_enable/aq_enable); with either off the kernels "
            "are not StatsQ-faithful at wq_bitw bits and packing would "
            "corrupt them. Every shipped recipe enables both.")
    p = Predictor.from_experiment(exp_dir, batch_size=1, use_best=use_best)
    params = jax.tree.map(np.asarray, p.params["params"])
    if args.model_type == "swin":
        # per-head dim is constant across stages (dims and head counts
        # double together); derive it instead of assuming Swin-T's 32
        cfg = p.model.cfg
        hk = {"head_dim": cfg.embed_dim // cfg.num_heads[0]}
    else:
        # DeiT: constant head count from the model config (head_dim varies
        # across variants — deit_test uses d=8, so never hardcode 64)
        hk = {"num_heads": p.model.cfg.num_heads}
    exported = export_packed(
        params, weight_bits=args.wq_bitw, qk_reparam=args.qk_reparam,
        wq_mode=args.wq_mode, wq_asym=getattr(args, "wq_asym", False), **hk)
    np.savez(out_path, **exported)
    fp32 = sum(np.asarray(v).nbytes for v in jax.tree.leaves(params))
    print(f"exported {out_path}: {artifact_nbytes(exported) / 1e6:.1f} MB "
          f"(fp32 checkpoint: {fp32 / 1e6:.1f} MB)")
    return out_path


def predictor_from_artifact(npz_path: str, args_yaml: str, *,
                            batch_size: int = 64,
                            int_core: bool = False) -> "Predictor":
    """Build a frozen-weight Predictor from a packed artifact + the
    experiment's args.yaml (for the model/policy configuration).

    int_core=True serves through the integer-core path: the quantized
    matmuls consume the artifact's int codes directly on the MXU's int8
    path (exact int32 accumulation; the fp frozen path's logits differ
    only by its own fp summation rounding).  Supported for StatsQ recipes
    (codes from scale siblings) and full-LSQ `--wq-mode lsq` recipes
    (codes from the learned weight_quant/s params)."""
    import dataclasses as _dc

    from .cli.common import build_parser, policy_from_namespace
    from .cli.runner import build_model
    from .deploy import restore_packed

    with open(args_yaml) as f:
        saved = yaml.safe_load(f)
    args = build_parser().parse_args([])
    for k, v in saved.items():
        if hasattr(args, k):
            setattr(args, k, v)
    # the artifact records its own weight_bits — that is the authoritative
    # value for code reconstruction; a mismatched args.yaml (wrong exp_dir
    # next to the right npz) would otherwise silently rebuild wrong codes
    with np.load(npz_path) as npz:
        exported = dict(npz)
    meta = json.loads(bytes(exported["__meta__"]).decode())
    if meta["weight_bits"] != args.wq_bitw:
        raise ValueError(
            f"artifact {npz_path} was packed at W{meta['weight_bits']} but "
            f"{args_yaml} says wq_bitw={args.wq_bitw}; wrong exp_dir for "
            f"this artifact")
    if bool(meta.get("qk_reparam", False)) != bool(args.qk_reparam):
        raise ValueError(
            f"artifact qk_reparam={meta.get('qk_reparam')} != args.yaml "
            f"qk_reparam={args.qk_reparam}; wrong exp_dir for this artifact")
    if meta.get("wq_mode", "statsq") != args.wq_mode:
        raise ValueError(
            f"artifact wq_mode={meta.get('wq_mode', 'statsq')!r} != "
            f"args.yaml wq_mode={args.wq_mode!r}; wrong exp_dir for this "
            f"artifact")
    meta_asym = bool(meta.get("wq_asym", False))
    if meta_asym != bool(getattr(args, "wq_asym", False)):
        # the asym/signed code range changes both decode and the int-core
        # eligibility window (unsigned W8 codes wrap int8) — a mismatched
        # pairing must not silently serve the wrong range
        raise ValueError(
            f"artifact wq_asym={meta_asym} != args.yaml "
            f"wq_asym={bool(getattr(args, 'wq_asym', False))}; wrong "
            f"exp_dir for this artifact")
    from .ops.int8_qlinear import int8_eligible, lsq_int8_eligible

    if int_core and args.wq_mode == "lsq":
        # full-LSQ integer core: codes reconstruct from the restored
        # weight_quant/s params (ops/int8_qlinear.frozen_lsq_weight_int)
        if args.qk_reparam:
            # lsq+QKR is not a reference configuration (the surgery's lsq
            # mode selects the non-QKR QAttention_lsq) and the QKR frozen
            # attention reconstructs StatsQ products only
            raise ValueError(
                "--int-core with --wq-mode lsq does not support "
                "--qk_reparam artifacts; serve without --int-core")
        if not lsq_int8_eligible(args.wq_bitw, args.aq_bitw,
                                 act_all_positive=True,
                                 w_all_positive=args.wq_asym):
            raise ValueError(
                f"--int-core full-LSQ supports W2..W{7 if args.wq_asym else 8}"
                f" / A<=7 artifacts, got W{args.wq_bitw}A{args.aq_bitw}; "
                f"serve without --int-core")
    elif int_core and not int8_eligible(args.wq_bitw, args.aq_bitw,
                                        all_positive=True):
        # outside these ranges the QLinears would silently fall back to
        # the fp frozen path (int8_eligible: W_int=2k+1 must fit int8;
        # the asymmetric fc2 input codes 0..2^a-1 need a <= 7) and any
        # reported int-core rate would actually be the fp path
        raise ValueError(
            f"--int-core supports W2..W4 / A<=7 artifacts, got "
            f"W{args.wq_bitw}A{args.aq_bitw}; serve without --int-core")
    policy = _dc.replace(policy_from_namespace(args), weight_frozen=True,
                         frozen_int_bits=(args.wq_bitw if int_core else None))
    # build through the runner path so every model-affecting flag of the
    # experiment (compute_dtype, matmul/attn impls, norm swap, img size)
    # applies identically to the frozen model
    model = build_model(args, policy)
    restored = restore_packed(exported, int_core=int_core)
    params = {"params": jax.tree.map(jnp.asarray, restored)}
    return Predictor(model, params, batch_size=batch_size,
                     img_size=args.img_size)


def main(argv=None):
    ap = argparse.ArgumentParser("ofq-serve smoke")
    ap.add_argument("exp_dir")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--export", default=None, metavar="OUT_NPZ",
                    help="freeze the experiment into a packed-integer "
                         "deployment artifact instead of serving")
    ap.add_argument("--artifact", default=None, metavar="NPZ",
                    help="serve a packed artifact (exp_dir supplies "
                         "args.yaml) instead of restoring a checkpoint")
    ap.add_argument("--int-core", action="store_true",
                    help="serve the artifact through the int8 MXU path "
                         "(exact integer accumulation)")
    ap.add_argument("--bench-iters", type=int, default=0,
                    help="time N predict() calls and report img/s")
    a = ap.parse_args(argv)
    if a.export:
        export_experiment(a.exp_dir, a.export)
        return
    if a.artifact:
        p = predictor_from_artifact(
            a.artifact, os.path.join(a.exp_dir, "args.yaml"),
            batch_size=a.batch_size, int_core=a.int_core)
    else:
        if a.int_core:
            ap.error("--int-core requires --artifact (the int8 path "
                     "consumes packed integer codes; a live checkpoint "
                     "serve would silently use the fp quantizer path)")
        p = Predictor.from_experiment(a.exp_dir, batch_size=a.batch_size)
    x = np.random.default_rng(0).normal(
        size=(a.batch_size, p.img_size, p.img_size, 3)).astype(np.float32)
    probs = p.predict(x)
    print("predict ok:", probs.shape, "max prob:", float(probs.max()))
    if a.bench_iters:
        import time

        t0 = time.perf_counter()
        for _ in range(a.bench_iters):
            probs = p.predict(x)
        dt = time.perf_counter() - t0
        print(f"serving rate: {a.batch_size * a.bench_iters / dt:.1f} "
              f"img/s (B={a.batch_size}, int_core={a.int_core})")


if __name__ == "__main__":
    main()
