"""Jitted train / eval steps.

The reference's per-step hot loop (train.py:860-995; CGA variant
cga.py:885-1074) becomes one jitted function: student forward, teacher
forward (stop-grad), KD loss, backward through the STEs, optional CGA
gradient masking + post-step restore, AdamW update, EMA — all on device,
no host sync per step.  The teacher runs inside the same jitted step
(reference runs it under no_grad on the same stream).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from . import cga as cga_lib
from .losses import hard_ce, kd_soft_and_hard, kd_soft_hard_qk, soft_ce
from .optim import ema_update
from .state import TrainState


def make_train_step(
    model,
    tx,
    *,
    teacher=None,
    loss_kind: str = "kd_soft_hard",  # ce | kd_soft | kd_soft_hard | kd_qk | kd_qkv
    label_smoothing: float = 0.0,
    ema_decay: Optional[float] = None,
    cga: Optional[dict] = None,  # dict(bits, boundary_range, qk_reparam, model_type)
    oscillation: Optional[dict] = None,  # dict(bits, momentum, freeze_threshold, ...)
    token_kd_alpha: float = 0.5,
    token_kd_type: str = "last",
    dampening: Optional[dict] = None,  # dict(bits, weighting)
    master_dtype: Optional[str] = None,  # 'bfloat16': bf16 param storage
    per_layer_grad_norms: bool = False,  # wandb.watch-style telemetry
) -> Callable:
    """Build the jitted train step closure.

    `cga` enables the outer freeze/restore transform (cga.py:940-1013
    semantics; see ofq_tpu/train/cga.py).
    """

    master_bf16 = master_dtype == "bfloat16"

    def _f32(tree):
        # promote-only: bf16 masters upcast to fp32 for the update math;
        # fp32 is untouched; fp64 (the x64 trajectory-differential tests)
        # must NOT be narrowed to fp32 or the 10-step torch comparison
        # would accumulate fp32 rounding noise per step
        return jax.tree.map(
            lambda p: p.astype(jnp.promote_types(p.dtype, jnp.float32)),
            tree)

    def loss_fn(params, model_state, batch, rng, teacher_params):
        rngs = {"dropout": rng, "droppath": jax.random.fold_in(rng, 1)}
        if master_bf16:
            # bf16 master weights, fp32 compute/quantizer math: upcast the
            # param view inside the step (BASELINE config 5; the bf16 win
            # is HBM footprint + collective bytes, not compute dtype)
            params = _f32(params)
        variables = {"params": params, **model_state}
        mutable = list(model_state.keys())  # e.g. ['batch_stats'] under BN
        if mutable:
            (student_out, student_info), state_updates = model.apply(
                variables, batch["image"], train=True, rngs=rngs,
                mutable=mutable)
        else:
            student_out, student_info = model.apply(
                variables, batch["image"], train=True, rngs=rngs)
            state_updates = {}
        if loss_kind == "ce":
            out = student_out[0] if isinstance(student_out, tuple) else student_out
            loss = hard_ce(out, batch["label"], label_smoothing)
        else:
            t_out, t_info = teacher.apply(
                {"params": teacher_params}, batch["image"], train=False)
            t_logits = jax.lax.stop_gradient(
                t_out[0] if isinstance(t_out, tuple) else t_out)
            if loss_kind == "kd_soft":
                out = student_out[0] if isinstance(student_out, tuple) else student_out
                loss = soft_ce(out, t_logits)
            elif loss_kind == "kd_soft_hard":
                loss = kd_soft_and_hard(student_out, batch["label"], t_logits)
            elif loss_kind in ("kd_qk", "kd_qkv"):
                t_info = jax.lax.stop_gradient(t_info)
                loss = kd_soft_hard_qk(
                    student_out, student_info, batch["label"], t_logits,
                    t_info, include_v=(loss_kind == "kd_qkv"))
            elif loss_kind == "kd_token":
                # KLTokenMSELoss (--use-token-kd): both models built with
                # return_features=True so aux carries per-block tokens.
                from .losses import kl_token_mse

                s_logits = (student_out[0] if isinstance(student_out, tuple)
                            else student_out)
                loss = kl_token_mse(
                    s_logits, student_info["features"], t_logits,
                    jax.lax.stop_gradient(t_info["features"]),
                    alpha=token_kd_alpha, kd_type=token_kd_type)
            else:
                raise ValueError(loss_kind)
        if dampening is not None and dampening.get("weighting", 0.0) > 0:
            # KDLossSoftandHard_dampening (utils.py:123-144): oscillation
            # dampening regularizer added onto the base loss
            from .losses import dampening_loss

            loss = loss + dampening_loss(
                params, dampening["bits"], dampening["weighting"])
        return loss, state_updates

    def train_step(state: TrainState, batch, rng, teacher_params=None):
        model_state = {k: v for k, v in state.params.items() if k != "params"}
        (loss, state_updates), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
            state.params["params"], model_state, batch, rng, teacher_params)

        masks = None
        if cga is not None:
            masks = cga_lib.freeze_masks(
                state.params["params"],
                bits=cga["bits"], boundary_range=cga["boundary_range"],
                qk_reparam=cga["qk_reparam"],
                model_type=cga.get("model_type", "deit"))
            grads = cga_lib.mask_grads(grads, masks)

        # update math always runs in fp32; optax.apply_updates would cast
        # the update to the param dtype BEFORE the add, losing low bits of
        # small updates under bf16 masters — add in fp32, cast after.
        updates, new_opt_state = tx.update(
            _f32(grads), state.opt_state, _f32(state.params["params"]))
        import optax

        new_params = jax.tree.map(
            lambda p, u: (p.astype(jnp.promote_types(p.dtype, jnp.float32))
                          + u.astype(jnp.promote_types(u.dtype, jnp.float32))
                          ).astype(p.dtype),
            state.params["params"], updates)
        if masks is not None:
            new_params = cga_lib.restore_frozen(
                state.params["params"], new_params, masks)

        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        if per_layer_grad_norms:
            # wandb.watch(log='all') analog (reference train.py:936-937):
            # per-top-level-module gradient norms, computed in-graph
            for name, sub in grads.items():
                metrics[f"grad_norm/{name}"] = optax.global_norm(sub)

        new_extra = state.extra
        if oscillation is not None and state.extra is not None:
            from .oscillation_hook import apply_frozen, update_oscillation_states

            osc_states, osc_metrics = update_oscillation_states(
                new_params, state.extra["oscillation"],
                bits=oscillation["bits"],
                momentum=oscillation.get("momentum", 0.01),
                freeze_threshold=oscillation.get("freeze_threshold", 0.0),
                qk_reparam=oscillation.get("qk_reparam", False),
                model_type=oscillation.get("model_type", "deit"))
            metrics.update(osc_metrics)
            new_extra = {**state.extra, "oscillation": osc_states}
            if oscillation.get("freeze_threshold", 0.0) > 0:
                new_params = apply_frozen(
                    state.params["params"], new_params, osc_states,
                    bits=oscillation["bits"],
                    qk_reparam=oscillation.get("qk_reparam", False),
                    model_type=oscillation.get("model_type", "deit"))

        new_ema = state.ema_params
        if ema_decay is not None and state.ema_params is not None:
            new_ema = ema_update(state.ema_params, new_params, ema_decay)

        return state.replace(
            params={**state.params, **state_updates, "params": new_params},
            opt_state=new_opt_state,
            step=state.step + 1,
            ema_params=new_ema,
            extra=new_extra,
        ), metrics

    return train_step


def make_eval_step(model) -> Callable:
    """Top-1/top-5 correctness counts for one batch (train.py:1012-1083).

    Accepts either a bare param pytree or a full variables dict (with
    'batch_stats' etc. when the BN-swapped model is in play)."""

    def eval_step(params, batch):
        variables = params if "params" in params else {"params": params}
        # bf16-master states evaluate with fp32 quantizer math
        variables = {**variables, "params": jax.tree.map(
            lambda p: (p.astype(jnp.float32)
                       if p.dtype == jnp.bfloat16 else p),
            variables["params"])}
        logits, _ = model.apply(variables, batch["image"], train=False)
        k = min(5, logits.shape[-1])
        top5 = jax.lax.top_k(logits, k)[1]
        label = batch["label"][:, None]
        # label -1 marks multi-host eval padding (pipeline shard equalizer);
        # such rows contribute to no count
        valid = batch["label"] >= 0
        correct1 = jnp.sum((top5[:, :1] == label) & valid[:, None])
        correct5 = jnp.sum((top5 == label) & valid[:, None])
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        nll = -jnp.take_along_axis(
            logp, jnp.clip(label, 0, None), axis=-1)[:, 0]
        return {
            "correct1": correct1,
            "correct5": correct5,
            "count": jnp.sum(valid.astype(jnp.int32)),
            "loss_sum": jnp.sum(nll * valid),
        }

    return eval_step
