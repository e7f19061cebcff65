"""Integer-core QLinear forward: the MXU consumes real int8 operands.

The QAT forward's fake-quant values are exact scaled integers:
  LSQ activations:  xq = s_a * X_int,  X_int in [thd_neg, thd_pos]
  StatsQ weights:   w_q = (s_w / 2n) * W_int,  W_int = 2k+1 odd,
                    |W_int| <= 2n-1, n = 2^(b-1)   (statsq.py mid-rise)
so the QLinear forward
  y = (x + b_pre -> LSQ -> + b_post) @ w_q
factorizes EXACTLY as
  y = (X_int @ W_int) * (s_a[token] * s_w[out] / 2n)  +  b_post @ w_q
with an int8 x int8 -> int32 matmul — which the TPU MXU executes at 2x
its bf16 rate with EXACT accumulation (no bf16 rounding of products).
`b_post @ w_q` is a (in,) x (in,out) matvec — batch-independent noise.

Eligibility: weight_bits <= 4 (W_int = 2k+1 needs |2k+1| <= 15 to stay
comfortably in int8; the shipped StatsQ recipes are W2/W3/W4) and
act bits <= 8.  The backward is the standard fp STE path (cotangents are
continuous — only the forward operands are integer), reproducing the
composed path's gradients exactly: same in-range masks, same LSQ scale
gradient with grad_scale factor, same fp32 bias-grad accumulation.

This is both a training speed path (--matmul-impl int8) and the serving
core (ofq_tpu.serve --int-core consumes packed artifact codes directly).
Reference anatomy: qlinear.py:28-87 + statsq.py:122-150.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from ..quant.lsq import _broadcast_scale, grad_scale_factor, thresholds
from ..quant.statsq import _CLIP_HI_EPS, statsq_scale
from ..quant.ste import clip_lower, grad_scale, round_pass

_S_EPS = 1e-5


def _act_int(x1, s_eff, bit, all_positive):
    """Integer LSQ codes of the biased input, in the input's dtype."""
    thd_neg, thd_pos = thresholds(bit, all_positive)
    u = x1 / s_eff
    return jnp.round(jnp.clip(u, thd_neg, thd_pos))


def _weight_int(kernel, bits, reduce_axis=0):
    """Odd integer StatsQ codes W_int = 2k+1 and the scale s_w.
    Same jnp op sequence as statsq_quantize (deploy.py's 1-ulp lesson) —
    the ONE derivation both the (in, out) QLinear kernels
    (reduce_axis=0, scale flattened to (out,)) and the (H*C, C) QKR
    product (reduce_axis=-1, per-row scale kept 2-D) share."""
    n = float(2 ** (bits - 1))
    s_w = statsq_scale(kernel, reduce_axis=reduce_axis)
    clipped = jnp.clip(kernel / s_w, -1.0, 1.0 - _CLIP_HI_EPS)
    k = jnp.round(clipped * n - 0.5)                  # [-n, n-1]
    w_int = 2.0 * k + 1.0
    return (w_int, s_w.reshape(-1)) if reduce_axis == 0 else (w_int, s_w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def int8_qlinear(x, kernel, s, b_pre, b_post, w_bits, a_bits, all_positive):
    y, _ = _fwd(x, kernel, s, b_pre, b_post, w_bits, a_bits, all_positive)
    return y


def _fwd(x, kernel, s, b_pre, b_post, w_bits, a_bits, all_positive):
    n = float(2 ** (w_bits - 1))
    x1 = x + b_pre.astype(x.dtype)
    s_b = _broadcast_scale(s, x1.shape, -2)
    s_eff = jnp.maximum(s_b, _S_EPS).astype(x.dtype)
    xi = _act_int(x1, s_eff, a_bits, all_positive)

    w_int, s_w = _weight_int(kernel.astype(jnp.float32), w_bits)
    acc = jax.lax.dot_general(
        xi.astype(jnp.int8), w_int.astype(jnp.int8),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    col = (s_w / (2.0 * n)).astype(jnp.float32)
    # b_post @ w_q == (b_post @ W_int) * col: the batch-independent (out,)
    # correction without materializing the dequantized kernel
    bq = (b_post.astype(jnp.float32) @ w_int) * col
    y = (acc.astype(jnp.float32)
         * s_eff.astype(jnp.float32) * col + bq).astype(x.dtype)
    return y, (x, kernel, s)


def _int8_qlinear_bwd(w_bits, a_bits, all_positive, res, g):
    """Composed-path cotangents, recomputed from (x, kernel, s, biases):
      dx2 = g @ w_q^T ; dkernel = x2^T g (StatsQ STE, scale detached);
      db_post = sum dx2 ; LSQ bwd (mask + scale grad) ; db_pre = sum dx1.
    Bias/scale grads accumulate fp32 (the converts fuse into reduces).
    Residuals are only the chain INPUT (+ small params): the quantized
    intermediates are recomputed here — cheap VPU work that also halves
    the chain's stored-residual HBM traffic vs the composed path."""
    x, kernel, s, b_pre, b_post = res
    thd_neg, thd_pos = thresholds(a_bits, all_positive)
    gf = grad_scale_factor(x.shape, a_bits, all_positive, -2)
    n = float(2 ** (w_bits - 1))

    x1 = x + b_pre.astype(x.dtype)
    s_b = _broadcast_scale(s, x1.shape, -2)
    s_eff = jnp.maximum(s_b, _S_EPS).astype(x.dtype)
    u = x1 / s_eff
    in_range = (u >= thd_neg) & (u <= thd_pos)
    xi = jnp.round(jnp.clip(u, thd_neg, thd_pos))
    xq = xi * s_eff
    x2 = xq + b_post.astype(x.dtype)

    w_int, s_w = _weight_int(kernel.astype(jnp.float32), w_bits)
    col = (s_w / (2.0 * n)).astype(jnp.float32)

    # dot cotangents — operands stay in the stream dtype (bf16 under the
    # speed path) with fp32 accumulation, exactly like the composed path's
    # backward dots; an fp32-operand dW dot would run the MXU at 1/4 rate.
    # g @ w_q^T == (g*col) @ W_int^T: scale the (..., out) cotangent
    # instead of materializing the dequantized (in, out) kernel
    gcol = (g.astype(jnp.float32) * col).astype(g.dtype)
    dx2 = jax.lax.dot_general(
        gcol, w_int.astype(g.dtype), (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(g.dtype)
    lead = tuple(range(g.ndim - 1))
    dkernel = jnp.einsum("...i,...o->io", x2, g,
                         preferred_element_type=jnp.float32)
    db_post = jnp.sum(dx2.astype(jnp.float32), axis=lead)

    # LSQ cotangents (identical to quant/lsq.py _lsq_fused_bwd)
    dx1 = jnp.where(in_range, dx2, jnp.zeros((), dx2.dtype))
    ds_elem = (jnp.where(in_range, xi - u, jnp.clip(u, thd_neg, thd_pos))
               * dx2).astype(jnp.float32)
    axes = tuple(a for a in range(x.ndim) if a != x.ndim - 2)
    ds = (jnp.sum(ds_elem, axis=axes).reshape(s.shape) * gf).astype(s.dtype)
    db_pre = jnp.sum(dx1.astype(jnp.float32), axis=lead)
    return dx1, dkernel.astype(kernel.dtype), ds, db_pre, db_post


def _fwd_with_biases(x, kernel, s, b_pre, b_post, w_bits, a_bits,
                     all_positive):
    y, (xr, kr, sr) = _fwd(x, kernel, s, b_pre, b_post, w_bits, a_bits,
                           all_positive)
    return y, (xr, kr, sr, b_pre, b_post)


int8_qlinear.defvjp(_fwd_with_biases, _int8_qlinear_bwd)


def int8_eligible(w_bits: int, a_bits: int,
                  all_positive: bool = False) -> bool:
    """int8 operands: |W_int| = |2k+1| <= 2^w_bits - 1 must fit int8 and
    activation codes must fit int8 — signed codes span
    [-2^(a-1), 2^(a-1)-1] (fits for a <= 8), but unsigned/asymmetric
    codes span [0, 2^a - 1], which overflows int8 at a == 8 (e.g. code
    250 wraps to -6), so those need a <= 7."""
    act_ok = a_bits <= (7 if all_positive else 8)
    return 2 <= w_bits <= 4 and act_ok


# --------------------------------------------- shared QKR int8 chain
# One implementation for both QKR attentions (nn/attention.py
# QAttentionQKR and models/swin.py QSwinAttentionQKR): the shared input
# codes and the v/qkx dot-plus-bias-correction algebra must never
# diverge between the two modules.
def qkr_int8_codes(x1, s, input_bits):
    """Integer LSQ codes of the (pre-biased) QKR input and the effective
    scale.  Exactly reproduces LsqAct(channel_axis=-2, signed)'s
    forward/backward: per-token grad-scale factor, eps clip with
    identity gradient, STE round."""
    gf = grad_scale_factor(x1.shape, input_bits, False, -2)
    s_b = _broadcast_scale(s, x1.shape, -2)
    s_eff = grad_scale(clip_lower(s_b, _S_EPS), gf).astype(x1.dtype)
    thd_neg, thd_pos = thresholds(input_bits, False)
    xi = round_pass(jnp.clip(x1 / s_eff, thd_neg, thd_pos))
    return xi, s_eff


def _unbroadcast(t: jax.Array, shape) -> jax.Array:
    """Sum `t` down to `shape` (same ndim, 1s on broadcast axes)."""
    axes = tuple(a for a in range(t.ndim) if shape[a] == 1 and t.shape[a] != 1)
    return jnp.sum(t, axis=axes, keepdims=True) if axes else t


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def int8_statsq_linear(xi, s_eff, bx, kernel, w_bits):
    """`(xi*s_eff + bx) @ StatsQ(kernel)` where `xi` is already
    INTEGER-valued (LSQ codes from an upstream round_pass chain): the dot
    runs int8 x int8 -> int32 on the MXU with the dequant column scale
    applied after, and the bias term folds to the batch-independent
    `(bx @ W_int) * col` correction — ONE kernel quantization per call,
    never a materialized dequantized kernel.

    The custom VJP emits the composed path's exact cotangent algebra
    (dxi = (g*s_eff) @ w_q^T; ds_eff = sum_out g*dot; dbx = sum g @ w_q^T;
    dkernel = (xi*s_eff + bx)^T @ g — the StatsQ STE) and stores `xi` as
    int8, HALVING that residual's HBM bytes vs the bf16 composed path.
    The caller keeps the LSQ grad-scale/clip chain outside (s_eff, bx are
    this op's differentiable inputs)."""
    y, _ = _int8_statsq_linear_fwd(xi, s_eff, bx, kernel, w_bits)
    return y


def _int8_statsq_linear_fwd(xi, s_eff, bx, kernel, w_bits):
    n = float(2 ** (w_bits - 1))
    w_int, s_w = _weight_int(kernel.astype(jnp.float32), w_bits)
    acc = jax.lax.dot_general(
        xi.astype(jnp.int8), w_int.astype(jnp.int8),
        (((xi.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    col = (s_w / (2.0 * n)).astype(jnp.float32)
    dot = (acc.astype(jnp.float32) * col).astype(xi.dtype)
    bq = ((bx.astype(jnp.float32) @ w_int) * col).astype(xi.dtype)
    y = dot * s_eff + bq
    return y, (xi.astype(jnp.int8), s_eff, bx, kernel, dot)


def _int8_statsq_linear_bwd(w_bits, res, g):
    xi8, s_eff, bx, kernel, dot = res
    n = float(2 ** (w_bits - 1))
    w_int, s_w = _weight_int(kernel.astype(jnp.float32), w_bits)
    col = (s_w / (2.0 * n)).astype(jnp.float32)

    # dxi = (g*s_eff) @ w_q^T == ((g*s_eff)*col) @ W_int^T — the stream-
    # dtype dot with fp32 accumulation, no dequantized kernel materialized
    gs = (g * s_eff).astype(g.dtype)
    gcol = (gs.astype(jnp.float32) * col).astype(g.dtype)
    dxi = jax.lax.dot_general(
        gcol, w_int.astype(g.dtype), (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(g.dtype)

    ds_full = jnp.sum((g.astype(jnp.float32) * dot.astype(jnp.float32)),
                      axis=-1, keepdims=True)
    ds_eff = _unbroadcast(ds_full, s_eff.shape).astype(s_eff.dtype)

    lead = tuple(range(g.ndim - 1))
    gsum = jnp.sum(g.astype(jnp.float32), axis=lead)          # (out,)
    dbx = ((gsum * col) @ w_int.T).astype(bx.dtype)           # (in,)

    # dkernel = x2^T @ g (StatsQ STE) with x2 = xi*s_eff + bx recomputed
    # from the int8 residual — stream-dtype operands, fp32 accumulation
    x2 = (xi8.astype(g.dtype) * s_eff + bx.astype(g.dtype)).astype(g.dtype)
    dkernel = jnp.einsum("...i,...o->io", x2, g,
                         preferred_element_type=jnp.float32)
    return dxi, ds_eff, dbx, dkernel.astype(kernel.dtype)


int8_statsq_linear.defvjp(_int8_statsq_linear_fwd, _int8_statsq_linear_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def int8_statsq_qkx(xi, s_eff, bx, w_qk, w_bits):
    """`einsum('bnj,hij->bnhi', xi*s_eff + bx, StatsQ(w_qk))` with int8
    MXU operands — the QKR qkx chain's dot, LAYOUT-PRESERVING.

    The flat `(B,N,C) @ (C,H*C)` int8 formulation produces a 2-D-layout
    output whose reshape to the 4-D (B,N,H,C) the downstream bias/LSQ
    chain runs on is layout-incompatible with the (B,H,N,C)-physical
    layout XLA picks for the surrounding einsums — reintroducing the
    materialized copies §5d removed (measured +13 ms/step on the bench
    workload).  Contracting the last axes of (B,N,C) x (H,C,C) directly
    emits the einsum's own layout; no copies.

    `w_qk` is the raw (H, C, C) per-head product tensor — the SAME
    shape its frozen-serving analog `frozen_int8_qkx` takes.  StatsQ
    scale/codes are derived per row of its flat (H*C, C) view
    (reduce_axis=-1), exactly matching the composed
    `statsq_quantize(w_qk.reshape(H*C, C), bits, reduce_axis=-1)`.
    `s_eff` is the per-token LSQ scale broadcast over the (B,N,C) input
    (constant along C, so it factors out of the contraction).  Cotangent
    algebra mirrors int8_statsq_linear with the einsum axes."""
    y, _ = _int8_statsq_qkx_fwd(xi, s_eff, bx, w_qk, w_bits)
    return y


def _qkx_parts(w_qk3, w_bits):
    H, C, _ = w_qk3.shape
    n = float(2 ** (w_bits - 1))
    # derive on the flat (H*C, C) view — the exact op sequence of the
    # composed path (free reshape; rows are the (h, i) pairs)
    w_int, s_w = _weight_int(
        w_qk3.astype(jnp.float32).reshape(H * C, C), w_bits,
        reduce_axis=-1)
    w3 = w_int.reshape(H, C, C)                       # (h, i, j)
    col = (s_w / (2.0 * n)).reshape(H, C)             # f32 (h, i)
    return w3, col


def _int8_statsq_qkx_fwd(xi, s_eff, bx, w_qk, w_bits):
    w3, col = _qkx_parts(w_qk, w_bits)
    acc = jax.lax.dot_general(
        xi.astype(jnp.int8), w3.astype(jnp.int8),
        (((xi.ndim - 1,), (2,)), ((), ())),
        preferred_element_type=jnp.int32)             # (B, N, H, C)
    dot = (acc.astype(jnp.float32) * col).astype(xi.dtype)
    bq = (jnp.einsum("j,hij->hi", bx.astype(jnp.float32), w3)
          * col).astype(xi.dtype)
    y = dot * s_eff[..., None] + bq
    return y, (xi.astype(jnp.int8), s_eff, bx, w_qk, dot)


def _int8_statsq_qkx_bwd(w_bits, res, g):
    xi8, s_eff, bx, w_qk, dot = res
    w3, col = _qkx_parts(w_qk, w_bits)

    # dxi = einsum('bnhi,hij->bnj', g*s_eff*w_q) — stream-dtype dot with
    # fp32 accumulation, the dequant column scale folded into the lhs
    gs = (g * s_eff[..., None]).astype(g.dtype)
    gcol = (gs.astype(jnp.float32) * col).astype(g.dtype)
    dxi = jax.lax.dot_general(
        gcol, w3.astype(g.dtype),
        (((g.ndim - 2, g.ndim - 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32).astype(g.dtype)

    ds_full = jnp.sum(g.astype(jnp.float32) * dot.astype(jnp.float32),
                      axis=(-2, -1))[..., None]       # (B, N, 1)
    ds_eff = _unbroadcast(ds_full, s_eff.shape).astype(s_eff.dtype)

    lead = tuple(range(g.ndim - 2))
    gsum = jnp.sum(g.astype(jnp.float32), axis=lead)  # (H, C)
    dbx = jnp.einsum("hi,hij->j", gsum * col, w3).astype(bx.dtype)

    # dW_qk = einsum('bnj,bnhi->hij', x2, g) (StatsQ STE) with x2
    # recomputed from the int8 residual
    x2 = (xi8.astype(g.dtype) * s_eff + bx.astype(g.dtype)).astype(g.dtype)
    dw_qk = jnp.einsum("...j,...hi->hij", x2, g,
                       preferred_element_type=jnp.float32
                       ).astype(w_qk.dtype)
    return dxi, ds_eff, dbx, dw_qk


int8_statsq_qkx.defvjp(_int8_statsq_qkx_fwd, _int8_statsq_qkx_bwd)


def frozen_int8_qkx(xi, s_eff, bx, w_qk3, qk_scale, bits):
    """Frozen-serving analog of int8_statsq_qkx (serve --int-core):
    the layout-preserving QKR qkx dot on a DEQUANTIZED (H, C, C)
    artifact product matrix, integer codes reconstructed from the
    stored per-row scale `qk_scale` (H*C, 1).  Contracting the last
    axes of (B,N,C) x (H,C,C) emits the 4-D (B,N,H,C) output in the
    downstream chain's own layout — the flat (C, H*C) formulation
    materialized layout copies (docs/DESIGN.md §5d).  Inference only
    (no VJP)."""
    H, C, _ = w_qk3.shape
    n = float(2 ** (bits - 1))
    col = (jnp.maximum(qk_scale.astype(jnp.float32), 1e-12)
           .reshape(H, C) / (2.0 * n))
    w_int = jnp.round(w_qk3.astype(jnp.float32) / col[..., None])
    acc = jax.lax.dot_general(
        xi.astype(jnp.int8), w_int.astype(jnp.int8),
        (((xi.ndim - 1,), (2,)), ((), ())),
        preferred_element_type=jnp.int32)             # (B, N, H, C)
    dot = acc.astype(jnp.float32) * col
    bq = jnp.einsum("j,hij->hi", bx.astype(jnp.float32), w_int) * col
    return (dot * s_eff[..., None].astype(jnp.float32)
            + bq).astype(xi.dtype)


def frozen_int8_linear(xi, s_eff, bx, w_q, w_scale, bits):
    """Frozen-serving analog of int8_statsq_linear: `w_q` holds
    DEQUANTIZED StatsQ values (in, out) whose integer codes are
    reconstructed from the stored artifact scale (serve --int-core)."""
    w_int, col = frozen_weight_int(w_q, w_scale, bits)
    bq = (bx.astype(jnp.float32) @ w_int) * col.reshape(-1)
    return (int8_code_dot(xi, w_int, col).astype(xi.dtype) * s_eff
            + bq.astype(xi.dtype))


# ------------------------------------------------------ frozen serving
def frozen_weight_int(w_q: jax.Array, w_scale: jax.Array, bits: int):
    """Reconstruct integer codes from a DEQUANTIZED StatsQ kernel and its
    stored original scale (ofq_tpu.serve --int-core).

    w_q = s*(2k+1)/2n, so round(w_q * 2n / s) == 2k+1 EXACTLY (|2k+1| <=
    15 at W<=4; fp32 rounding error ~1e-7 relative, snapped by round).
    StatsQ is not idempotent, so `s` must be the artifact's scale — it
    cannot be recomputed from w_q."""
    n = float(2 ** (bits - 1))
    col = jnp.maximum(w_scale.astype(jnp.float32), 1e-12) / (2.0 * n)
    w_int = jnp.round(w_q.astype(jnp.float32) / col)
    return w_int, col


def int8_code_dot(xi: jax.Array, w_int: jax.Array, col: jax.Array):
    """int8 dot on given integer codes; returns fp32 (..., out) already
    column-rescaled.  Inference building block (no VJP: serving only)."""
    acc = jax.lax.dot_general(
        xi.astype(jnp.int8), w_int.astype(jnp.int8),
        (((xi.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * col.reshape(-1)


def _frozen_int_core(x, w_int, col, s, b_pre, b_post, *, a_bits,
                     all_positive):
    """Shared inference-only integer-core tail: quantize the activations
    to int8 codes, run the int8 x int8 -> int32 MXU dot on the given
    weight codes, and fold the scales/bias-correction back in fp32."""
    x1 = x + b_pre.astype(x.dtype)
    s_b = _broadcast_scale(s, x1.shape, -2)
    s_eff = jnp.maximum(s_b, _S_EPS).astype(x.dtype)
    xi = _act_int(x1, s_eff, a_bits, all_positive)
    acc = jax.lax.dot_general(
        xi.astype(jnp.int8), w_int.astype(jnp.int8),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    bq = (b_post.astype(jnp.float32) @ w_int) * col.reshape(-1)
    y = (acc.astype(jnp.float32) * s_eff.astype(jnp.float32)
         * col.reshape(-1) + bq)
    return y.astype(x.dtype)


def frozen_int8_forward(x, w_q, w_scale, s, b_pre, b_post, *,
                        w_bits, a_bits, all_positive):
    """Inference-only integer-core QLinear on frozen (dequantized) kernels:
    same factorization as int8_qlinear, with W_int reconstructed from the
    stored scale instead of re-derived from live weights."""
    w_int, col = frozen_weight_int(w_q, w_scale, w_bits)
    return _frozen_int_core(x, w_int, col, s, b_pre, b_post,
                            a_bits=a_bits, all_positive=all_positive)


def lsq_int8_eligible(w_bits: int, a_bits: int,
                      act_all_positive: bool = False,
                      w_all_positive: bool = False) -> bool:
    """Full-LSQ (--wq-mode lsq) integer-core eligibility: signed LSQ
    weight codes span [-2^(b-1), 2^(b-1)-1] (int8-safe for b <= 8),
    unsigned --wq_asym codes span [0, 2^b-1] (b <= 7); activation rule
    as int8_eligible."""
    act_ok = a_bits <= (7 if act_all_positive else 8)
    w_ok = 2 <= w_bits <= (7 if w_all_positive else 8)
    return w_ok and act_ok


def frozen_lsq_weight_int(w_q: jax.Array, w_s: jax.Array):
    """Reconstruct integer codes from a DEQUANTIZED full-LSQ kernel and
    its LEARNED scale param (serve --int-core on --wq-mode lsq runs).

    w_q = max(s, 1e-5) * k with k = clip(round(w/s)) an exact integer
    (deploy._lsq_encode/_lsq_decode), so round(w_q / max(s, 1e-5))
    recovers k exactly; unlike StatsQ there is no mid-rise 2n factor and
    no bit-width dependence (the code RANGE is policed by
    lsq_int8_eligible + the artifact's wq_asym meta guard in serve)."""
    col = jnp.maximum(w_s.astype(jnp.float32).reshape(1, -1), _S_EPS)
    w_int = jnp.round(w_q.astype(jnp.float32) / col)
    return w_int, col


def frozen_lsq_int8_forward(x, w_q, w_s, s, b_pre, b_post, *,
                            a_bits, all_positive):
    """frozen_int8_forward for full-LSQ kernels: codes come from the
    learned per-channel weight scale (the weight_quant/s param restored
    from the artifact) instead of a StatsQ scale sibling."""
    w_int, col = frozen_lsq_weight_int(w_q, w_s)
    return _frozen_int_core(x, w_int, col, s, b_pre, b_post,
                            a_bits=a_bits, all_positive=all_positive)
