"""Knowledge-distillation and QAT losses.

TPU-native reimplementation of the reference loss zoo
(reference: src/quantization/utils.py).  All losses are pure functions of
(student outputs, targets, teacher outputs) suitable for use inside a
jitted train step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def soft_ce(student_logits: jax.Array, teacher_logits: jax.Array,
            temperature: float = 1.0) -> jax.Array:
    """Cross-entropy between student logits and teacher softmax.

    Reference: utils.py:44-57 (`KLLossSoft`).
    """
    s = student_logits / temperature
    t = teacher_logits / temperature
    t_prob = jax.nn.softmax(t, axis=-1)
    s_logprob = jax.nn.log_softmax(s, axis=-1)
    return -jnp.mean(jnp.sum(t_prob * s_logprob, axis=-1))


def hard_ce(logits: jax.Array, target: jax.Array,
            label_smoothing: float = 0.0) -> jax.Array:
    """Cross-entropy with integer class targets or soft (mixed) targets."""
    logprob = jax.nn.log_softmax(logits, axis=-1)
    if target.ndim == logits.ndim:
        # soft targets (mixup/cutmix)
        nll = -jnp.sum(target * logprob, axis=-1)
    else:
        n_cls = logits.shape[-1]
        nll = -jnp.take_along_axis(logprob, target[..., None], axis=-1)[..., 0]
        if label_smoothing > 0:
            smooth = -jnp.mean(logprob, axis=-1)
            nll = (1 - label_smoothing) * nll + label_smoothing * smooth
            return jnp.mean(nll)
        del n_cls
    return jnp.mean(nll)


def kd_soft_and_hard(student_out, hard_target, teacher_logits) -> jax.Array:
    """Soft KD on the distillation head + hard CE on the class head.

    Reference: utils.py:59-77 (`KDLossSoftandHard`) — the default recipe
    loss (kd_hard_and_soft=1 in every shipped train script).
    Distilled models pass `student_out = (cls_logits, dist_logits)`.
    """
    if isinstance(student_out, tuple):
        cls_out, dist_out = student_out
        return soft_ce(dist_out, teacher_logits) + hard_ce(cls_out, hard_target)
    return soft_ce(student_out, teacher_logits) + hard_ce(student_out, hard_target)


def _normed_l2_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    """||a/||a|| - b/||b||||_2  (reference utils.py:166-171, att_loss_r2b)."""
    a = a / jnp.linalg.norm(a)
    b = b / jnp.linalg.norm(b)
    return jnp.linalg.norm(a - b)


def direction_matching(student_scores: Sequence[jax.Array],
                       teacher_scores: Sequence[jax.Array]) -> jax.Array:
    """Sum of normalized-L2 distances over layers, masking large-negative
    (attention-masked) entries to zero.

    Reference: utils.py:173-184 (`direction_matching_distillation`).
    """
    total = 0.0
    for s, t in zip(student_scores, teacher_scores):
        s = jnp.where(s <= -1e2, 0.0, s)
        t = jnp.where(t <= -1e2, 0.0, t)
        total = total + _normed_l2_distance(s, t)
    return total


def kd_soft_hard_qk(student_out, student_attn_info, hard_target,
                    teacher_logits, teacher_attn_info,
                    include_v: bool = False) -> jax.Array:
    """KD + q/k(-and optionally v) Gram-matrix direction matching.

    Reference: utils.py:186-219 (`KDLossSoftandHard_qk`) and 221-258
    (`_qkv`).  attn_info is a per-layer tuple (attn, qqT, kkT, vvT).
    """
    base = kd_soft_and_hard(student_out, hard_target, teacher_logits)
    sq = [info[1] for info in student_attn_info]
    tq = [info[1] for info in teacher_attn_info]
    sk = [info[2] for info in student_attn_info]
    tk = [info[2] for info in teacher_attn_info]
    extra = direction_matching(sq, tq) + direction_matching(sk, tk)
    if include_v:
        sv = [info[3] for info in student_attn_info]
        tv = [info[3] for info in teacher_attn_info]
        extra = extra + direction_matching(sv, tv)
    return base + extra


def kl_token_mse(student_logits, student_tokens, teacher_logits,
                 teacher_tokens, alpha: float = 0.5,
                 kd_type: str = "last") -> jax.Array:
    """Soft KD + token-embedding MSE ('last' or 'all' intermediate layers).

    Reference: utils.py:260-308 (`KLTokenMSELoss`).  Token tensors are
    (B, N, C); the student may carry extra prefix tokens which are cut to
    the teacher's N (utils.py:282-294).
    """
    kl = soft_ce(student_logits, teacher_logits)
    if kd_type == "last":
        s = student_tokens[-1] if isinstance(student_tokens, (list, tuple)) else student_tokens
        t = teacher_tokens[-1] if isinstance(teacher_tokens, (list, tuple)) else teacher_tokens
        n = t.shape[1]
        mse = jnp.mean((s[:, -n:] - t) ** 2)
    elif kd_type == "all":
        assert len(student_tokens) == len(teacher_tokens)
        mse = 0.0
        for s, t in zip(student_tokens, teacher_tokens):
            n = t.shape[1]
            mse = mse + jnp.mean((s[:, -n:] - t) ** 2)
        mse = mse / len(student_tokens)
    else:
        raise NotImplementedError(kd_type)
    return kl + alpha * mse


def dampening_loss(params, bits: int, weighting: float = 0.0) -> jax.Array:
    """Oscillation-dampening regularizer sum((w_q - clip(w))^2) over StatsQ
    kernels.  Reference: utils.py:79-121 (`DampeningLoss`) — shipped with
    weighting=0 (off) but kept for capability parity.
    """
    if weighting == 0.0:
        return jnp.asarray(0.0)
    from ..quant.statsq import _CLIP_HI_EPS, statsq_quantize, statsq_scale

    total = 0.0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, w in flat:
        names = [getattr(p, "key", "") for p in path]
        if names and names[-1] == "kernel" and any(
            n in ("fc1", "fc2", "qkv", "proj") for n in names
        ):
            wq = jax.lax.stop_gradient(statsq_quantize(w, bits))
            s = statsq_scale(w)
            w_clip = jnp.clip(w, -s, s * (1.0 - _CLIP_HI_EPS))
            total = total + jnp.sum((wq - w_clip) ** 2)
    return weighting * total
