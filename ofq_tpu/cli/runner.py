"""Shared train/eval runner behind the CLIs.

Maps the reference harness (reference: train.py:444-858 `main`,
train_one_epoch :860, validate :1012, eval.py, cga.py) onto the jitted
TPU step.  Host-side responsibilities: data iteration, epoch bookkeeping,
checkpointing, CSV summary, logging.  Everything per-step runs on device.
"""

from __future__ import annotations

import csv
import dataclasses
import logging
import os
import time
from typing import Any, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from ..data import DataConfig, make_dataset, mixup_cutmix
from ..models import create_model
from ..parallel import batch_shardings, make_mesh, shard_params
from ..train import (
    TrainState,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from ..train.checkpoint import (abstract_like, make_manager, restore_latest,
                                save_epoch)
from ..train.schedule import constant_lr, cosine_with_warmup_cooldown
from .common import experiment_dir, policy_from_namespace

_logger = logging.getLogger("ofq_tpu")


def select_loss_kind(args) -> str:
    """Reference loss selection (train.py:744-766)."""
    if getattr(args, "use_token_kd", False):
        return "kd_token"
    if args.use_kd:
        return {0: "kd_soft", 1: "kd_soft_hard", 2: "kd_qk",
                3: "kd_qkv"}[args.kd_hard_and_soft]
    return "ce"


def build_model(args, policy, *, teacher: bool = False):
    name = args.teacher if teacher else args.model
    mtype = args.teacher_type if teacher else args.model_type
    qqkkvv = args.use_kd and args.kd_hard_and_soft in (2, 3)
    over = dict(num_classes=args.num_classes, qqkkvv=qqkkvv)
    if getattr(args, "use_token_kd", False) and mtype == "deit":
        over["return_features"] = True
    if mtype == "swin":
        over["drop_path_rate"] = args.drop_path
    elif args.drop_path:
        over["drop_path_rate"] = args.drop_path
    if args.img_size != 224:
        over["img_size"] = args.img_size
    if args.replace_ln_by_bn and not teacher:
        # reference --replace-ln-by-bn (train.py:521-522): student only.
        # Supported for both families; for Swin this is the flag's evident
        # intent implemented natively — the reference itself crashes on
        # Swin's 4-D maps (see SwinConfig.norm_layer).
        over["norm_layer"] = "batchnorm"
    if not teacher:
        # TPU speed-path flags apply to both DeiT and Swin students
        if args.matmul_impl and args.matmul_impl != "xla":
            over["matmul_impl"] = args.matmul_impl
        attn_impl = getattr(args, "attn_impl", "auto")
        if attn_impl == "auto":
            # measured on v5e (docs/DESIGN.md §5): the XLA composition
            # beats both the Pallas core and the remat tail end-to-end
            attn_impl = None
        if attn_impl and attn_impl != "xla":
            if mtype == "deit" or attn_impl == "remat":
                # 'remat' is supported for both families (Swin wraps only
                # the window-attention tail); 'fused' stays DeiT-only —
                # the Pallas core is a measured loss at 49-token windows
                # (docs/DESIGN.md §5e)
                over["attn_impl"] = attn_impl
            else:
                _logger.warning(
                    "--attn-impl %s is DeiT-only (Swin's windowed cells are "
                    "too small for the fused core); using the XLA "
                    "composition", attn_impl)
    if args.compute_dtype and args.compute_dtype != "float32":
        # the bf16 stream applies to the teacher too (its forward is ~25%
        # of the step FLOPs and carries no quantizer state to protect)
        over["compute_dtype"] = args.compute_dtype
    from ..quant.policy import QuantPolicy

    if teacher:
        if args.quant_teacher:
            # reference --quant_teacher (train.py:436-441): W4A4 teacher
            pol = dataclasses.replace(
                policy,
                weight=dataclasses.replace(policy.weight, bit=4),
                act=dataclasses.replace(policy.act, bit=4),
            )
        else:
            pol = QuantPolicy()
    else:
        pol = policy
    return create_model(name, policy=pol, **over)


def _prune_unloaded_scales(dest, loaded):
    """Drop every LSQ scale leaf ('s') of `dest` that `loaded` did not
    provide (path absent or shape mismatch — the same criterion
    merge_pretrained uses to copy), so a lazy apply re-creates it from
    live activations.  Returns (pruned_tree, n_pruned)."""
    pruned = {}
    n = 0
    for k, v in dest.items():
        lv = loaded.get(k) if isinstance(loaded, dict) else None
        if isinstance(v, dict):
            sub, m = _prune_unloaded_scales(
                v, lv if isinstance(lv, dict) else {})
            if sub:
                pruned[k] = sub
            n += m
        elif k == "s" and (
                lv is None or tuple(np.shape(lv)) != tuple(np.shape(v))):
            n += 1
        else:
            pruned[k] = v
    return pruned, n


def recalibrate_missing_scales(model, variables, loaded, image,
                               *, seed: int = 0, use_jit: bool = True):
    """Lazy flax re-init of every LSQ scale `loaded` did not provide,
    computed with the loaded weights in place (the reference's
    load-then-setup_alpha ordering).  Returns (new_variables, n_redone).
    Shared by Runner.recalibrate_scales and the model-level calibration
    differential (tests/test_calibration_differential.py), which runs it
    eagerly in fp64 against the genuine reference's setup_alpha."""
    pruned, n = _prune_unloaded_scales(variables["params"], loaded)
    if n == 0:
        return variables, 0

    def lazy(v, xx, key):
        return model.apply(v, xx, train=False, mutable=["params"],
                           rngs={"params": key})[1]["params"]

    fn = jax.jit(lazy) if use_jit else lazy
    new_params = fn({**variables, "params": pruned}, image,
                    jax.random.key(seed))
    return {**variables, "params": new_params}, n


class Runner:
    def __init__(self, args, *, cga_mode: bool = False):
        self.args = args
        self.cga_mode = cga_mode
        self.policy = policy_from_namespace(args)
        self.model = build_model(args, self.policy)
        self.loss_kind = select_loss_kind(args)
        self.teacher = (build_model(args, self.policy, teacher=True)
                        if self.loss_kind != "ce" else None)
        self.mesh = make_mesh(model_parallel=args.mesh_model_parallel)
        self.out_dir = experiment_dir(args)

        data_dir = args.data_dir
        if data_dir in ("synthetic", "", None):
            data_dir = None
        # multi-host pods: each host loads its slice of the global batch
        # (distinct stream via a per-process seed) and the slices are
        # assembled into one globally-sharded array per step.
        from ..parallel import host_batch_slice

        self.n_proc = jax.process_count()
        per_host_batch, _ = host_batch_slice(args.batch_size)
        # common seed + disjoint per-host file shards (DistributedSampler
        # semantics): a global batch assembled across hosts is duplicate-free
        # and an epoch partitions the dataset.  Augmentation draws are
        # unseeded tf ops, so they differ per host regardless.
        self.data_cfg = DataConfig(
            data_dir=data_dir, img_size=args.img_size,
            batch_size=per_host_batch, num_classes=args.num_classes,
            crop_pct=args.crop_pct, aa=args.aa or None, reprob=args.reprob,
            seed=args.seed,
            num_aug_repeats=args.num_aug_repeats,
            synthetic_length=per_host_batch * (args.steps_per_epoch or 4),
            shard_index=jax.process_index(), shard_count=self.n_proc,
        )

    # ------------------------------------------------------------ setup
    def calibrate_init(self, batch):
        """Initialize params with data-dependent LSQ calibration — the
        explicit replacement for setup_alpha (train.py:997-1010): one
        eval-mode forward on a real batch materializes every scale."""
        x = jnp.asarray(batch["image"])
        init = jax.jit(
            lambda key, xx: self.model.init({"params": key}, xx, train=False))
        return init(jax.random.key(self.args.seed), x)

    def recalibrate_scales(self, variables, loaded, batch):
        """Re-initialize every LSQ scale the checkpoint did NOT provide,
        from activations computed WITH the loaded weights.

        The reference loads weights BEFORE calibrating (train.py:515-516
        `load_checkpoint` precedes the `setup_alpha` forward at :657/997),
        so every lazily materialized scale sees pretrained-weight
        statistics.  `calibrate_init` necessarily runs before the overlay
        (flax init builds the tree), so its scale inits saw random-init
        activations; this pass redoes exactly the missing ones via a lazy
        flax apply — mutable=['params'] re-creates each pruned scale in
        forward order, every downstream init seeing upstream's
        just-initialized quantizers, the torch lazy-materialization
        semantics.  Scales the checkpoint DOES carry (quantized warm
        starts, resumes) are kept verbatim, matching the reference's
        resume-after-setup_alpha overwrite.  Model-level differential vs
        the genuine reference: tests/test_calibration_differential.py."""
        out, n = recalibrate_missing_scales(
            self.model, variables, loaded, jnp.asarray(batch["image"]),
            seed=self.args.seed)
        if n:
            _logger.info(
                "recalibrated %d LSQ scales from the loaded weights "
                "(setup_alpha ordering, reference train.py:515-516 -> :997)",
                n)
        return out

    def abstract_state(self, variables, args=None):
        """Abstract TrainState matching what fit() saves — same optimizer
        chain (incl. grad clipping), EMA and oscillation structure — so
        orbax restore sees an identical pytree."""
        args = args or self.args
        if getattr(args, "master_dtype", "float32") == "bfloat16":
            variables = {**variables, "params": jax.tree.map(
                lambda p: jax.ShapeDtypeStruct(p.shape, jnp.bfloat16)
                if hasattr(p, "shape") else p, variables["params"])}
        tx = make_optimizer(
            lambda _: 0.0, weight_decay=args.weight_decay,
            clip_grad=args.clip_grad, clip_mode=args.clip_mode)
        extra = None
        if getattr(args, "track_oscillation", False):
            from ..train.oscillation_hook import init_oscillation_states

            extra = {"oscillation": init_oscillation_states(
                variables["params"], bits=args.wq_bitw,
                qk_reparam=args.qk_reparam, model_type=args.model_type)}
        return jax.eval_shape(
            lambda v: TrainState.create(v, tx, ema=args.model_ema,
                                        extra=extra), variables)

    def restore_experiment_params(self, exp_dir: str, variables,
                                  *, use_ema: bool | None = False,
                                  return_loaded: bool = False):
        """Load the best checkpoint's variables from an experiment dir.

        The checkpoint is restored into the structure of the model THAT
        experiment trained (rebuilt from its args.yaml), then overlaid
        onto the current params by matching paths/shapes — so a CGA phase
        can start from a phase-1 checkpoint even when the architectures
        differ in detail (e.g. fused-qkv phase 1 -> QKR phase 2, the
        reference's strict=False resume behavior).

        use_ema: False loads the raw weights (warm starts — the
        reference's --initial-checkpoint path, timm load_checkpoint
        use_ema default).  None = auto: prefer the EMA weights when the
        experiment trained with --model-ema — those are the weights that
        scored checkpoint retention (reference train.py:830-836) and the
        weights reference eval.py validates under --model-ema
        (load_checkpoint(..., use_ema=True), eval.py:709-715)."""
        import argparse

        from ..convert import merge_pretrained, split_qkv_for_qkr
        from ..train.checkpoint import restore_best

        saved_args = self.args
        args_path = os.path.join(exp_dir, "args.yaml")
        if os.path.exists(args_path):
            with open(args_path) as f:
                saved = yaml.safe_load(f) or {}
            saved_args = argparse.Namespace(**{**vars(self.args), **saved})
        saved_policy = policy_from_namespace(saved_args)
        saved_model = build_model(saved_args, saved_policy)
        saved_vars = jax.eval_shape(
            lambda k, xx: saved_model.init({"params": k}, xx, train=False),
            jax.random.key(0),
            jax.ShapeDtypeStruct(
                (1, saved_args.img_size, saved_args.img_size, 3),
                jnp.float32))
        mgr = make_manager(exp_dir, metric_name=self.args.eval_metric)
        state = restore_best(mgr, self.abstract_state(saved_vars, saved_args))
        if state is None:
            raise FileNotFoundError(f"no orbax checkpoints under {exp_dir}")
        src = state.params["params"]
        if use_ema is None:
            use_ema = bool(getattr(saved_args, "model_ema", False))
        if use_ema and state.ema_params is not None:
            _logger.info("restoring EMA weights (the retention metric's)")
            src = state.ema_params
        loaded = jax.tree.map(np.asarray, src)
        # split fused qkv only when the DESTINATION tree is QKR-shaped
        # (q_kernel present) and the loaded tree is fused — decided from
        # structure, not from the student policy: the destination may be
        # the float/quantized teacher or the student.
        dest = variables["params"]
        common = [k for k in dest
                  if k in loaded and isinstance(dest[k], dict)]
        # covers DeiT 'blocks_i' AND Swin 'features_f_b' modules
        needs_split = any(
            isinstance(dest[b].get("attn"), dict)
            and "q_kernel" in dest[b]["attn"]
            and "qkv" in (loaded[b].get("attn") or {})
            for b in common)
        if needs_split:
            loaded = split_qkv_for_qkr(loaded)
        merged = merge_pretrained(dest, loaded)
        out = {**variables, "params": jax.tree.map(jnp.asarray, merged)}
        # overlay the checkpoint's OTHER variable collections too —
        # dropping them would eval a --replace-ln-by-bn model with
        # calibration-init batch_stats (mean 0 / var 1: near-random
        # top-1) and reset LsqImg's sticky quant_stats signedness
        for coll, tree in state.params.items():
            if coll == "params" or coll not in variables:
                continue
            mc = merge_pretrained(variables[coll],
                                  jax.tree.map(np.asarray, tree))
            out[coll] = jax.tree.map(jnp.asarray, mc)
        return (out, loaded) if return_loaded else out

    def load_pretrained(self, params, calib_batch=None):
        """Overlay an initial checkpoint; with `calib_batch`, re-calibrate
        every LSQ scale the checkpoint didn't provide (setup_alpha
        ordering — see recalibrate_scales)."""
        args = self.args
        path = args.initial_checkpoint
        if not path:
            if args.pretrained_initialized:
                raise ValueError(
                    "--pretrained_initialized requires --initial-checkpoint "
                    "<local FP checkpoint> on this zero-egress setup (the "
                    "reference downloads timm/torchvision weights; pass the "
                    "file explicitly instead). Training from random init "
                    "will not reach the recipe's accuracy.")
            return params
        from ..convert import (
            convert_deit, convert_swin, load_torch_state_dict,
            merge_pretrained, split_qkv_for_qkr)

        _logger.info("loading initial checkpoint %s", path)
        if os.path.isdir(path):
            # an ofq_tpu experiment directory (e.g. CGA --resume phase-1)
            out, loaded = self.restore_experiment_params(
                path, params, return_loaded=True)
            if calib_batch is not None:
                out = self.recalibrate_scales(out, loaded, calib_batch)
            return out
        if path.endswith((".pth", ".pth.tar", ".pt", ".bin")):
            sd = load_torch_state_dict(path)
            if args.model_type == "swin":
                loaded = convert_swin(sd, img_size=args.img_size)
            else:
                loaded = convert_deit(sd, depth=self.model.cfg.depth,
                                      img_size=args.img_size)
            if self.policy.qk_reparam:
                # both families: a QKR student has q/k/v kernels where the
                # checkpoint has fused qkv; without the split every
                # attention projection would silently train from random
                # init (merge_pretrained skips keys absent from dest)
                loaded = split_qkv_for_qkr(loaded)
        else:  # our own orbax/npz export
            import pickle

            with open(path, "rb") as f:
                loaded = pickle.load(f)
        new = merge_pretrained(params["params"], loaded)
        out = {**params, "params": jax.tree.map(jnp.asarray, new)}
        if path.endswith((".pth", ".pth.tar", ".pt", ".bin")) \
                and "batch_stats" in params:
            # a BN checkpoint (--replace-ln-by-bn run) carries running
            # stats; dropping them would eval with calibration-init
            # mean 0 / var 1
            from ..convert import convert_bn_stats

            bn = convert_bn_stats(sd)
            if bn:
                out["batch_stats"] = jax.tree.map(
                    jnp.asarray,
                    merge_pretrained(params["batch_stats"], bn))
        if calib_batch is not None:
            out = self.recalibrate_scales(out, loaded, calib_batch)
        return out

    def build_optimizer(self, steps_per_epoch: int):
        args = self.args
        if self.cga_mode:
            # cga.py:760 jumps past the cosine phase: LR pinned at min_lr.
            lr_epoch = constant_lr(args.min_lr)
        else:
            lr_epoch = cosine_with_warmup_cooldown(
                args.lr, epochs=args.epochs,
                warmup_epochs=args.warmup_epochs,
                warmup_lr=args.warmup_lr, min_lr=args.min_lr)
        lr_fn = lambda count: lr_epoch(count // steps_per_epoch)
        return make_optimizer(
            lr_fn, weight_decay=args.weight_decay,
            clip_grad=args.clip_grad, clip_mode=args.clip_mode), lr_epoch

    # ------------------------------------------------------------- fit
    def _stop_profiler(self):
        """Close an open --profile-steps trace; safe to call repeatedly
        (loop break, preemption, and normal exit all route through here)."""
        if getattr(self, "_prof_active", False):
            import jax.profiler

            jax.profiler.stop_trace()
            self._prof_active = False
            _logger.info("profiler trace written to %s",
                         os.path.join(self.out_dir, "trace"))

    def _save_recovery(self, total_steps: int, state) -> bool:
        """Write a step-indexed recovery snapshot WITHOUT ever deleting
        before saving: a crash between a delete and the async save
        completing must never leave zero recovery snapshots (preemption is
        exactly when that window matters).  max_to_keep=2 lets orbax keep
        one committed snapshot while the new one is in flight.  A
        same-step-id collision means a PRIOR run's lineage wrote this id
        (this process saves strictly increasing ids, tracked in
        _recovery_saved); keeping the stale snapshot would let auto-resume
        restore a different trajectory's state as if it were ours, so it
        is deleted and re-saved from the live state — the only case where
        a delete precedes the save, and it targets only snapshots proven
        not to be this run's."""
        if not hasattr(self, "_recovery_mgr"):
            self._recovery_mgr = make_manager(
                os.path.join(self.out_dir, "recovery"), max_to_keep=2)
            self._recovery_saved = set()
        if total_steps in self._recovery_saved:
            return False  # this run already snapshotted this exact step
        if total_steps in self._recovery_mgr.all_steps():
            _logger.warning(
                "recovery snapshot for step %d exists from a prior run; "
                "replacing it with the live state", total_steps)
            self._recovery_mgr.delete(total_steps)
        save_epoch(self._recovery_mgr, total_steps, state)
        self._recovery_saved.add(total_steps)
        return True

    def _install_preemption_handler(self):
        """SIGTERM (pod preemption / job eviction) -> finish the in-flight
        step, save a recovery checkpoint, exit cleanly.  The reference has
        no preemption story (SURVEY §5 — its recovery is checkpoint-based
        only); on TPU pods eviction is routine, so the runner treats it as
        a first-class event.  Auto-resume picks the run back up."""
        import signal

        self._preempted = False

        def _on_sigterm(signum, frame):
            self._preempted = True
            _logger.warning(
                "SIGTERM received: will checkpoint and exit at the next "
                "step boundary")

        try:
            signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:
            # not the main thread (e.g. some test harnesses) — skip
            pass

    def fit(self) -> dict:
        args = self.args
        os.makedirs(self.out_dir, exist_ok=True)
        self._install_preemption_handler()
        if args.log_wandb and jax.process_index() == 0:
            # init up front so per-step logging (incl. --wandb-watch grad
            # norms) is live from step 0, not only after the first epoch
            # (non-zero hosts never init, so their wandb.run stays None and
            # the per-step/epoch log guards keep them silent)
            try:
                import wandb

                if wandb.run is None:
                    wandb.init(project="ofq_tpu",
                               name=args.experiment or None,
                               config=vars(args))
            except ImportError:
                _logger.warning("--log-wandb set but wandb missing")
        with open(os.path.join(self.out_dir, "args.yaml"), "w") as f:
            yaml.safe_dump(vars(args), f)

        from ..data.pipeline import num_samples

        train_it = make_dataset(self.data_cfg, train=True)
        steps_per_epoch = args.steps_per_epoch or max(
            num_samples(self.data_cfg, train=True) // args.batch_size, 1)

        # calibration must be host-invariant (identical LSQ init on every
        # pod host): fixed seed, no sharding, and the DETERMINISTIC eval
        # transform — the train pipeline's augmentation draws are unseeded
        # per-process tf ops, so train-transformed pixels differ per host
        # and would give each host different scale inits.  (The reference's
        # setup_alpha has per-rank batches too and relies on DDP's rank-0
        # param broadcast to reconverge; eval-transform calibration is the
        # SPMD-native equivalent and is reproducible run-to-run as a bonus.)
        calib_cfg = dataclasses.replace(
            self.data_cfg, seed=args.seed, shard_index=0, shard_count=1,
            eval_transform=True)
        first = next(iter(make_dataset(calib_cfg, train=True)))
        params = self.calibrate_init(first)
        params = self.load_pretrained(params, calib_batch=first)
        tx, lr_epoch = self.build_optimizer(steps_per_epoch)

        tparams = None
        if self.teacher is not None:
            if args.teacher_pretrained and not args.teacher_checkpoint:
                raise ValueError(
                    "--teacher_pretrained requires --teacher_checkpoint "
                    "<local FP checkpoint> on this zero-egress setup; "
                    "distilling from a randomly initialized teacher would "
                    "silently destroy accuracy.")
            tinit = jax.jit(lambda key, xx: self.teacher.init(
                {"params": key}, xx, train=False))
            tparams = tinit(jax.random.key(0),
                            jnp.asarray(first["image"]))["params"]
            if args.teacher_checkpoint and os.path.isdir(
                    args.teacher_checkpoint):
                # teacher from one of our own experiments (e.g. the FP run
                # that warm-started the student)
                tparams = self.restore_experiment_params(
                    args.teacher_checkpoint, {"params": tparams})["params"]
            elif args.teacher_checkpoint:
                from ..convert import (
                    convert_deit, convert_swin, load_torch_state_dict,
                    merge_pretrained)

                sd = load_torch_state_dict(args.teacher_checkpoint)
                conv = (convert_swin if args.teacher_type == "swin"
                        else convert_deit)
                tparams = jax.tree.map(
                    jnp.asarray, merge_pretrained(tparams, conv(sd)))
            if getattr(args, "compute_dtype", "float32") == "bfloat16":
                # frozen teacher weights stored in bf16: halves their HBM
                # footprint and read bandwidth; the teacher model itself
                # already runs under compute_dtype
                tparams = jax.tree.map(
                    lambda p: (p.astype(jnp.bfloat16)
                               if p.dtype == jnp.float32 else p), tparams)

        if getattr(args, "master_dtype", "float32") == "bfloat16":
            params = {**params, "params": jax.tree.map(
                lambda p: p.astype(jnp.bfloat16), params["params"])}
        with jax.set_mesh(self.mesh):
            # keep non-param collections (batch_stats, quant_stats) —
            # replicated alongside the sharded params
            params = {**params,
                      "params": shard_params(params["params"], self.mesh)}
            if tparams is not None:
                tparams = shard_params(tparams, self.mesh)
            extra = None
            osc_cfg = None
            if getattr(args, "track_oscillation", False):
                from ..train.oscillation_hook import init_oscillation_states

                extra = {"oscillation": init_oscillation_states(
                    params["params"], bits=args.wq_bitw,
                    qk_reparam=args.qk_reparam, model_type=args.model_type)}
                osc_cfg = dict(
                    bits=args.wq_bitw,
                    freeze_threshold=args.oscillation_freeze_threshold,
                    qk_reparam=args.qk_reparam, model_type=args.model_type)
            state = jax.jit(lambda p: TrainState.create(
                p, tx, ema=args.model_ema, extra=extra))(params)

            cga_cfg = None
            if self.cga_mode and getattr(args, "cga_no_freeze", False):
                # equal-budget A/B control: pinned-LR window, no freezing.
                # qk_reparam_type 1 would still freeze in-forward via
                # StatsQuantizer_specific_4_qkreparam_cga — reject loudly.
                if args.qk_reparam_type == 1:
                    raise ValueError(
                        "--cga_no_freeze requires --qk_reparam_type 0: "
                        "type 1's quantizer freezes in-forward")
            elif self.cga_mode:
                cga_cfg = dict(bits=args.wq_bitw,
                               boundary_range=args.boundary_range,
                               qk_reparam=args.qk_reparam,
                               model_type=args.model_type)
            damp_cfg = None
            if getattr(args, "dampening_loss_weighting", 0.0) > 0:
                damp_cfg = dict(bits=args.wq_bitw,
                                weighting=args.dampening_loss_weighting)
            step = jax.jit(make_train_step(
                self.model, tx, teacher=self.teacher,
                loss_kind=self.loss_kind,
                label_smoothing=args.smoothing,
                ema_decay=args.model_ema_decay if args.model_ema else None,
                cga=cga_cfg, oscillation=osc_cfg,
                token_kd_alpha=args.kd_alpha,
                token_kd_type=args.kd_type,
                dampening=damp_cfg,
                master_dtype=getattr(args, "master_dtype", None),
                per_layer_grad_norms=getattr(args, "wandb_watch", False)),
                donate_argnums=(0,))
            eval_step = jax.jit(make_eval_step(self.model))

            mgr = make_manager(self.out_dir, max_to_keep=args.checkpoint_hist,
                               metric_name=args.eval_metric)
            # abstract_like (NOT eval_shape): carries the live state's
            # target shardings so auto-resume re-shards a checkpoint
            # saved under a different mesh topology (train.py:691-706)
            restored, start_epoch = restore_latest(mgr, abstract_like(state))
            if restored is not None:
                _logger.info("auto-resumed from epoch %d", start_epoch)
                state = restored
            # recovery snapshots (--recovery-interval / preemption) are
            # step-indexed; prefer one that is AHEAD of the last full
            # epoch — it restarts the current epoch's data pass but keeps
            # the optimizer/params at the later step
            rec_dir = os.path.join(self.out_dir, "recovery")
            if os.path.isdir(rec_dir):
                rec_mgr = make_manager(rec_dir, max_to_keep=2)
                rec_state, rec_next = restore_latest(
                    rec_mgr, abstract_like(state))
                if (rec_state is not None
                        and rec_next - 1 > start_epoch * steps_per_epoch):
                    state = rec_state
                    start_epoch = (rec_next - 1) // steps_per_epoch
                    _logger.info(
                        "resumed from recovery snapshot at step %d "
                        "(restarting epoch %d)", rec_next - 1, start_epoch)
            if self.cga_mode:
                # reference cga.py:760,835: a FIXED `freeze_for_n_epochs`
                # window; resume continues within it, never extends it
                num_epochs = args.freeze_for_n_epochs
            else:
                num_epochs = args.epochs + args.cooldown_epochs

            bs = batch_shardings(self.mesh)
            key = jax.random.key(args.seed)
            summary_path = os.path.join(self.out_dir, "summary.csv")
            best = {"top1": -1.0, "epoch": -1}
            # the GLOBAL optimizer step count, persisted in the checkpoint:
            # recovery snapshots are numbered by it, so it must continue
            # across resumes (a per-run counter would write under-numbered
            # snapshots that lose to stale ones or get discarded)
            total_steps = int(state.step)
            # mid-epoch resume (recovery snapshot, or an epoch checkpoint
            # written after a --max-steps break): skip the already-consumed
            # steps of the restarted epoch so total optimizer steps stay
            # aligned with epoch*steps_per_epoch — otherwise the step-driven
            # LR schedule and recovery comparisons drift upward
            resume_it = total_steps % steps_per_epoch
            # --profile-steps: trigger relative to THIS process's first
            # step, so the capture also fires on auto-resumed runs (where
            # total_steps continues from the checkpoint, past any absolute
            # trigger); shrink the warmup when --max-steps is short
            prof_n = getattr(args, "profile_steps", 0) or 0
            prof_start = total_steps + 5
            if prof_n and args.max_steps:
                prof_start = max(
                    min(prof_start, args.max_steps - prof_n), total_steps)
            batch = next(train_it)
            mixup_on = (args.mixup > 0 or args.cutmix > 0)

            for epoch in range(start_epoch, num_epochs):
                t0 = time.time()
                losses = []
                it0 = resume_it if epoch == start_epoch else 0
                for it in range(it0, steps_per_epoch):
                    if self.n_proc > 1:
                        from ..parallel import local_to_global

                        dev_batch = local_to_global(batch, self.mesh, bs)
                    else:
                        dev_batch = {
                            "image": jax.device_put(
                                jnp.asarray(batch["image"]), bs["image"]),
                            "label": jax.device_put(
                                jnp.asarray(batch["label"]), bs["label"]),
                        }
                    key, sk, mk = jax.random.split(key, 3)
                    # mixup/cutmix applies irrespective of loss kind, like
                    # the reference's mixup_fn (train.py:893 runs before the
                    # loss switch); every hard-CE branch accepts soft
                    # targets and the soft-only losses ignore the label
                    if mixup_on:
                        dev_batch = mixup_cutmix(
                            dev_batch, mk,
                            mixup_alpha=args.mixup, cutmix_alpha=args.cutmix,
                            prob=args.mixup_prob,
                            switch_prob=args.mixup_switch_prob,
                            num_classes=args.num_classes,
                            label_smoothing=args.smoothing)
                        dev_batch["label"] = dev_batch.pop("soft_label")
                    # --profile-steps N: capture a jax.profiler device trace
                    # of N post-warmup steps into <experiment>/trace (XProf/
                    # TensorBoard-openable; works through the axon tunnel).
                    # Any still-open trace is closed on every loop exit
                    # path (see _stop_profiler).
                    if (prof_n and jax.process_index() == 0
                            and total_steps == prof_start):
                        jax.profiler.start_trace(
                            os.path.join(self.out_dir, "trace"))
                        self._prof_active = True
                    state, metrics = step(state, dev_batch, sk, tparams)
                    total_steps += 1
                    if (getattr(self, "_prof_active", False)
                            and total_steps >= prof_start + prof_n):
                        float(metrics["loss"])  # barrier: flush device work
                        self._stop_profiler()
                    if it % args.log_interval == 0:
                        loss = float(metrics["loss"])
                        losses.append(loss)
                        osc = ""
                        if "oscillation/ema_mean" in metrics:
                            osc = " osc_ema %.5f" % float(
                                metrics["oscillation/ema_mean"])
                        _logger.info(
                            "epoch %d step %d/%d loss %.4f lr %.3e%s",
                            epoch, it, steps_per_epoch, loss,
                            float(lr_epoch(epoch)), osc)
                        if args.log_wandb:
                            try:
                                import wandb

                                if wandb.run is not None:
                                    wandb.log({
                                        "step": total_steps,
                                        **{k: float(v)
                                           for k, v in metrics.items()}})
                            except ImportError:
                                pass
                    if (args.recovery_interval
                            and total_steps % args.recovery_interval == 0):
                        # in-epoch crash-recovery snapshot, step-indexed and
                        # kept separately from the per-epoch best-k set
                        # (reference train.py:983-985, saver.save_recovery)
                        self._save_recovery(total_steps, state)
                    if getattr(self, "_preempted", False):
                        break
                    if args.max_steps and total_steps >= args.max_steps:
                        break
                    batch = next(train_it)

                if getattr(self, "_preempted", False):
                    self._stop_profiler()
                    # preemption: persist a step-indexed recovery snapshot
                    # and exit without the (expensive) eval — auto-resume
                    # restores from <output>/recovery or last epoch
                    just_saved = bool(
                        args.recovery_interval
                        and total_steps % args.recovery_interval == 0)
                    wrote = (self._save_recovery(total_steps, state)
                             if not just_saved else True)
                    if hasattr(self, "_recovery_mgr"):
                        self._recovery_mgr.wait_until_finished()
                    mgr.wait_until_finished()
                    _logger.warning(
                        "preempted at epoch %d step %d: recovery snapshot "
                        "%s, exiting", epoch, total_steps,
                        "saved" if wrote
                        else "already present (prior run, same step)")
                    return best

                # pass the full variables dict so BN batch_stats (if any)
                # reach eval
                eval_metrics = self.evaluate(eval_step, state.params)
                if args.model_ema and state.ema_params is not None:
                    # reference train.py:830-836: EMA weights are validated
                    # too and their metric drives checkpoint retention.
                    # (merge non-param collections, e.g. BN batch_stats)
                    ema_vars = {**state.params, "params": state.ema_params}
                    ema_metrics = self.evaluate(eval_step, ema_vars)
                    _logger.info("epoch %d EMA: top1 %.3f", epoch,
                                 ema_metrics["top1"])
                    eval_metrics = ema_metrics
                dt = time.time() - t0
                _logger.info(
                    "epoch %d done in %.1fs: top1 %.3f top5 %.3f",
                    epoch, dt, eval_metrics["top1"], eval_metrics["top5"])
                save_epoch(mgr, epoch, state, eval_metrics)
                write_header = not os.path.exists(summary_path)
                with open(summary_path, "a", newline="") as f:
                    w = csv.writer(f)
                    if write_header:
                        w.writerow(["epoch", "train_loss", "top1", "top5",
                                    "lr", "seconds"])
                    w.writerow([epoch, np.mean(losses) if losses else "",
                                eval_metrics["top1"], eval_metrics["top5"],
                                float(lr_epoch(epoch)), round(dt, 1)])
                if eval_metrics["top1"] > best["top1"]:
                    best = {"top1": eval_metrics["top1"], "epoch": epoch}
                if args.log_wandb:
                    try:
                        import wandb

                        if wandb.run is None:
                            wandb.init(project="ofq_tpu",
                                       name=args.experiment or None,
                                       config=vars(args))
                        wandb.log({"epoch": epoch, **eval_metrics,
                                   "lr": float(lr_epoch(epoch))})
                    except ImportError:
                        _logger.warning("--log-wandb set but wandb missing")
                if args.max_steps and total_steps >= args.max_steps:
                    break
            self._stop_profiler()
            # drain in-flight async checkpoint writes before returning
            mgr.wait_until_finished()
            if hasattr(self, "_recovery_mgr"):
                self._recovery_mgr.wait_until_finished()
            _logger.info("best top1 %.3f at epoch %d", best["top1"],
                         best["epoch"])
            return best

    # ------------------------------------------------------------ eval
    def evaluate(self, eval_step, params) -> dict:
        # the validation set is partitioned across hosts (disjoint shards,
        # label=-1 padding equalizes stream lengths); per-batch counts are
        # already global under the assembled sharded arrays.  Counts
        # accumulate ON DEVICE — a single host fetch per epoch, not four
        # per batch (each fetch is a full sync; ruinous over slow links).
        totals = None
        eval_cfg = dataclasses.replace(self.data_cfg, seed=self.args.seed)
        for batch in make_dataset(eval_cfg, train=False):
            if self.n_proc > 1:
                from ..parallel import batch_shardings, local_to_global

                dev = local_to_global(
                    batch, self.mesh, batch_shardings(self.mesh))
            else:
                dev = {"image": jnp.asarray(batch["image"]),
                       "label": jnp.asarray(batch["label"])}
            out = eval_step(params, dev)
            totals = out if totals is None else jax.tree.map(
                jnp.add, totals, out)
        if totals is None:
            return {"top1": 0.0, "top5": 0.0, "loss": float("nan")}
        totals = jax.tree.map(float, totals)
        n = max(totals["count"], 1.0)
        return {"top1": 100.0 * totals["correct1"] / n,
                "top5": 100.0 * totals["correct5"] / n,
                "loss": totals["loss_sum"] / n}

    def evaluate_only(self) -> dict:
        """eval.py analog: build, load checkpoint, validate.

        --resume accepts a torch .pth.tar (converted on the fly), a pickle
        of a param tree, or an ofq_tpu experiment directory (orbax best
        checkpoint)."""
        args = self.args
        calib_cfg = dataclasses.replace(
            self.data_cfg, shard_index=0, shard_count=1)
        first = next(iter(make_dataset(calib_cfg, train=False)))
        params = self.calibrate_init(first)
        if args.resume and os.path.isdir(args.resume):
            # use_ema=None (auto): an experiment trained with --model-ema
            # is scored/retained by its EMA metric — evaluate those
            # weights, like reference eval.py's use_ema=True load
            params, loaded = self.restore_experiment_params(
                args.resume, params, use_ema=None, return_loaded=True)
            params = self.recalibrate_scales(params, loaded, first)
        elif args.resume:
            args.initial_checkpoint = args.resume
            params = self.load_pretrained(params, calib_batch=first)
        with jax.set_mesh(self.mesh):
            eval_step = jax.jit(make_eval_step(self.model))
            # full variables dict so BN batch_stats (if any) reach eval
            metrics = self.evaluate(eval_step, params)
        _logger.info("eval: top1 %.3f top5 %.3f loss %.4f",
                     metrics["top1"], metrics["top5"], metrics["loss"])
        return metrics
