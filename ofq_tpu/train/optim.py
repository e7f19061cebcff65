"""Optimizer construction: AdamW with no-weight-decay masks, AGC, EMA.

Reference equivalents:
  * `create_optimizer_v2(opt='adamw')` + the model's `no_weight_decay()`
    set {pos_embed, cls_token, dist_token} (train.py:662,
    deit_vision_transformer.py:272-274).  timm also exempts all 1-D params
    (biases, norms) from weight decay — preserved here.
  * `adaptive_clip_grad` (AGC) (src/quantization/utils.py:8-27).
  * `ModelEmaV2` (train.py:709-715) as a pure EMA update.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


_NO_DECAY_NAMES = ("pos_embed", "cls_token", "dist_token")


def wd_mask(params) -> object:
    """True where weight decay applies: >=2-D params not in the no-decay
    set (timm convention: 1-D params — biases, LN/LSQ scales, LearnableBias
    — are never decayed)."""

    def mask_leaf(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        if any(n in _NO_DECAY_NAMES for n in names):
            return False
        # timm exempts params named *.bias and all <=1-D params; our 2-D
        # ImageBias ('bias') and LSQ scales ('s') fall under the same rule.
        if names and names[-1] in ("bias", "s"):
            return False
        return leaf.ndim >= 2

    flat = jax.tree_util.tree_map_with_path(mask_leaf, params)
    return flat


def unitwise_norm(x: jax.Array, keep_axis: int = -1) -> jax.Array:
    """L2 norm per output unit (utils.py:8-12, timm unitwise semantics).

    The reference keeps dim 0.  For KERNELS that means the torch
    (out, in) / (O, I, kh, kw) output axis, which in this repo's Flax
    (in, out) / HWIO layout is LAST (keep_axis=-1); every other >=2-D
    param (pos_embed, cls/dist tokens, relative-position tables) has the
    SAME layout as torch, so the reference grouping is keep_axis=0.
    Differential-tested against the reference's adaptive_clip_grad in
    tests/test_torch_differential.py."""
    if x.ndim <= 1:
        return jnp.linalg.norm(x)
    keep = keep_axis % x.ndim
    axes = tuple(a for a in range(x.ndim) if a != keep)
    return jnp.sqrt(jnp.sum(x * x, axis=axes, keepdims=True))


def adaptive_grad_clip(clip_factor: float = 0.01, eps: float = 1e-3,
                       exclude_head: bool = False
                       ) -> optax.GradientTransformation:
    """AGC: clip each unit's gradient to clip_factor * ||param||.

    Reference: utils.py:15-27 (`adaptive_clip_grad`), dispatched by timm's
    `dispatch_clip_grad(..., value=args.clip_grad, mode='agc')`
    (train.py:930-932) — so the CLI `--clip-grad` VALUE is the AGC
    clip_factor.  Per-leaf grouping matches the reference exactly:
      * '*kernel' leaves (kernel/q_kernel/k_kernel/v_kernel) are stored
        TRANSPOSED vs torch -> keep the last axis (the output units);
      * a 2-D 'bias' leaf is ImageBias, which torch stores FLAT (one
        224*224 vector, qbias.py:15-23) -> whole-tensor norm;
      * every other >=2-D leaf keeps axis 0 like the reference (same
        layout in both frameworks: pos_embed (1,N,C) and cls/dist
        (1,1,C) collapse to a whole-tensor norm via their size-1 dim 0,
        rel-pos tables group per table row).

    `exclude_head` mirrors timm's `model_parameters(model,
    exclude_head='agc' in clip_mode)` (train.py:931), which drops the
    LAST TWO entries of `model.parameters()`.  After the reference's
    module surgery those are not the classifier weights timm's hack
    intended but the final head module's `move_b4.bias` / `move_aft.bias`
    (LSQ_QLinear4head registers weight, bias, input_quant_fn.s,
    [lsqw_fn.s,] move_b4.bias, move_aft.bias — qlinear.py:193-221); the
    last head module is `head_dist` for distilled DeiT, `head` otherwise.
    We replicate that actual behavior, not the intent."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def _norm_for(path, t):
        names = [getattr(p, "key", "") for p in path]
        leaf = names[-1] if names else ""
        if leaf.endswith("kernel"):
            return unitwise_norm(t, keep_axis=-1)
        if leaf == "bias" and t.ndim == 2:  # ImageBias (H, W): torch-flat
            return jnp.linalg.norm(t)
        return unitwise_norm(t, keep_axis=0)

    def _last_head(updates) -> str:
        names = set()
        for path, _ in jax.tree_util.tree_flatten_with_path(updates)[0]:
            names.update(getattr(p, "key", "") for p in path)
        return "head_dist" if "head_dist" in names else "head"

    def update_fn(updates, state, params=None):
        assert params is not None
        skip_head = _last_head(updates) if exclude_head else None
        # a QUANTIZED head's last-two torch params are its move biases;
        # an FP head (policy without head/head_dist) is a plain Linear
        # whose last two are weight and bias — skip those instead
        # (reference: timm model_parameters drops parameters()[-2:])
        head_quantized = bool(
            skip_head is not None
            and isinstance(updates.get(skip_head), dict)
            and "move_b4" in updates[skip_head])
        skip_leaves = (("move_b4", "move_aft") if head_quantized
                       else ("kernel", "bias"))

        def clip_leaf(path, g, p):
            names = [getattr(p_, "key", "") for p_ in path]
            if (skip_head is not None and skip_head in names
                    and any(n in skip_leaves for n in names)):
                return g
            p_norm = jnp.maximum(_norm_for(path, p), eps) * clip_factor
            g_norm = _norm_for(path, g)
            clipped = g * (p_norm / jnp.maximum(g_norm, 1e-6))
            return jnp.where(g_norm < p_norm, g, clipped)

        return (jax.tree_util.tree_map_with_path(clip_leaf, updates, params),
                state)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    lr_schedule: Callable,
    *,
    weight_decay: float = 0.05,
    betas: tuple[float, float] = (0.9, 0.999),
    eps: float = 1e-8,
    clip_grad: Optional[float] = None,
    clip_mode: str = "norm",
) -> optax.GradientTransformation:
    """AdamW + optional gradient clipping, mirroring the reference flags."""
    chain = []
    if clip_grad is not None:
        if clip_mode == "norm":
            chain.append(optax.clip_by_global_norm(clip_grad))
        elif clip_mode == "value":
            chain.append(optax.clip(clip_grad))
        elif clip_mode == "agc":
            # timm dispatch: the --clip-grad VALUE is the AGC factor
            # (train.py:930-932), with the last head module's move
            # biases excluded (the [:-2] parameters hack, see
            # adaptive_grad_clip)
            chain.append(adaptive_grad_clip(clip_factor=clip_grad,
                                            exclude_head=True))
        else:
            raise ValueError(clip_mode)
    chain.append(
        optax.adamw(
            learning_rate=lr_schedule,
            b1=betas[0], b2=betas[1], eps=eps,
            weight_decay=weight_decay,
            mask=wd_mask,
        )
    )
    return optax.chain(*chain)


def ema_update(ema_params, params, decay: float = 0.9999):
    """ModelEmaV2-style exponential moving average of the param pytree.

    EMA state is fp32 (TrainState.create) regardless of the master dtype:
    with decay 0.9999 the per-step delta is ~1e-4 of the param magnitude,
    below the bf16 ulp — storing the accumulator in bf16 would freeze it
    at initialization forever (verified numerically)."""
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p.astype(jnp.float32),
        ema_params, params)
