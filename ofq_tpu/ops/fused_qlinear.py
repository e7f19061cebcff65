"""Fully-fused quantized linear: LSQ(activation) + StatsQ(weight) + matmul.

The QLinear hot path (reference: qlinear.py:58-73) is, per forward:
    shift -> LSQ fake-quant -> shift -> StatsQ fake-quant -> matmul
Under XLA the two quantization chains are elementwise VPU passes
*serialized* with the MXU matmul.  This op fuses everything into one
Pallas kernel where quantization runs in VMEM overlapped with the MXU —
and exploits the algebra of fake quantization to run the contraction on
small *integers*:

    xq = s_x * round(clamp(u)),      u = (x + b_pre) / s_x
    wq = s_w * (2*round(c*n - .5)+1) / (2n)
    y  = xq @ wq + (b_post @ wq + bias)
       = [s_x (.) s_w/(2n)] * ( XI @ WI ) + bvec
with XI in [-n_a, n_a-1] and WI odd integers in [-(2n-1), 2n-1] — both
exactly representable in bf16, so the MXU runs at bf16 rate with fp32
accumulation and **no quantization-precision loss** (in fact more exact
than XLA's default-precision f32 matmul, which truncates the fake-quant
products to bf16).

The post-quant shift folds into the matmul:  (xq + b_post) @ wq =
xq @ wq + b_post @ wq, a cheap XLA matvec.

Backward is closed-form XLA (one fused pass):
    dxq = g @ wq^T ; dx = dxq * 1[u in range] ; db_pre = sum_m dx
    ds  = gf * sum_{b,k} (in ? round(u)-u : clamp(u)) * dxq   per token
    dW  = xq^T @ g  (STE; scale detached)
    db_post = (sum_m g) @ wq^T ; dbias = sum_m g
exactly the cotangents of the composed reference modules (tested).

Measured on v5e (DeiT-S W2A2 QKR, B=128, best-of-3): the fused kernel wins
isolated microbenchmarks (~1.3-1.7x on the fc1 shape) but the END-TO-END
step is currently faster with the XLA composition (212 ms vs 233 ms) —
XLA's cross-op fusion and scheduling beat per-op kernels at these model
sizes, and its default-precision matmul already runs the MXU at bf16 rate.
The integer-core path remains more *accurate* (no bf16 truncation of the
fake-quant products) and is the foundation for a future whole-block kernel;
it is opt-in via matmul_impl='fused'.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.lsq import grad_scale_factor, thresholds
from ..quant.statsq import _CLIP_HI_EPS, statsq_scale

_S_EPS = 1e-5


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _w_levels_int(w, sw, n):
    """Odd-integer weight levels: 2*round(clip(w/s)*n - .5) + 1."""
    c = jnp.clip(w / sw, -1.0, 1.0 - _CLIP_HI_EPS)
    return 2.0 * jnp.round(c * n - 0.5) + 1.0


def _wq_value(w, sw, n):
    return sw * (_w_levels_int(w, sw, n) / (2.0 * n))


def _fwd_kernel(x_ref, bp_ref, sx_ref, w_ref, sw_ref, bvec_ref, o_ref,
                acc_ref, *, a_lo, a_hi, n_w, out_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s = sx_ref[:]                      # (TM, 1)
    u = (x_ref[:] + bp_ref[:]) / s
    xi = jnp.round(jnp.clip(u, a_lo, a_hi)).astype(jnp.bfloat16)
    wi = _w_levels_int(w_ref[:], sw_ref[:], n_w).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(xi, wi, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        y = acc_ref[:] * sx_ref[:] * (sw_ref[:] / (2.0 * n_w))
        o_ref[:] = (y + bvec_ref[:]).astype(out_dtype)


def _fwd_call(x2, s_full, b_pre, w, sw, bvec, *, a_lo, a_hi, n_w, interpret,
              out_dtype):
    M, K = x2.shape
    N = w.shape[1]
    TM = min(256, _round_up(M, 8))
    TN = min(512, _round_up(N, 128))
    TK = min(512, _round_up(K, 128))
    Mp, Kp, Np = _round_up(M, TM), _round_up(K, TK), _round_up(N, TN)
    xp = jnp.pad(x2, ((0, Mp - M), (0, Kp - K)))
    sp = jnp.pad(s_full, ((0, Mp - M), (0, 0)), constant_values=1.0)
    bpp = jnp.pad(b_pre.reshape(1, K), ((0, 0), (0, Kp - K)))
    wp = jnp.pad(w, ((0, Kp - K), (0, Np - N)))
    swp = jnp.pad(sw, ((0, 0), (0, Np - N)), constant_values=1.0)
    bvp = jnp.pad(bvec.reshape(1, N), ((0, 0), (0, Np - N)))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, a_lo=a_lo, a_hi=a_hi, n_w=n_w,
                          out_dtype=out_dtype),
        grid=(Mp // TM, Np // TN, Kp // TK),
        in_specs=[
            pl.BlockSpec((TM, TK), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TK), lambda i, j, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, 1), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, TN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Kp * Np, transcendentals=0,
            bytes_accessed=4 * (Mp * Kp + Kp * Np + Mp * Np)),
        interpret=interpret,
    )(xp, bpp, sp, wp, swp, bvp)
    return out[:M, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _fused(x, kernel, s, b_pre, b_post, bias,
           w_bits, a_bits, all_positive, interpret):
    y, _ = _fused_fwd(x, kernel, s, b_pre, b_post, bias,
                      w_bits, a_bits, all_positive, interpret)
    return y


def _prep(x, s):
    B_shape = x.shape[:-1]
    K = x.shape[-1]
    x2 = x.reshape(-1, K).astype(jnp.float32)
    # s is per-token: shape (N_tokens,) indexed by axis -2 of x
    n_tok = x.shape[-2]
    reps = x2.shape[0] // n_tok
    s_eff = jnp.maximum(s.astype(jnp.float32), _S_EPS)
    s_full = jnp.tile(s_eff, reps).reshape(-1, 1)
    return x2, s_full, B_shape


def _fused_fwd(x, kernel, s, b_pre, b_post, bias,
               w_bits, a_bits, all_positive, interpret):
    a_lo, a_hi = thresholds(a_bits, all_positive)
    n_w = float(2 ** (w_bits - 1))
    x2, s_full, B_shape = _prep(x, s)
    sw = statsq_scale(kernel)
    wq = _wq_value(kernel, sw, n_w)
    bvec = b_post @ wq
    if bias is not None:
        bvec = bvec + bias
    y2 = _fwd_call(x2, s_full, b_pre, kernel, sw, bvec,
                   a_lo=a_lo, a_hi=a_hi, n_w=n_w, interpret=interpret,
                   out_dtype=jnp.float32)
    # fp32 accumulation inside the kernel, but the OUTPUT follows the
    # stream dtype like the composed/int8 paths — returning fp32 from a
    # bf16-stream QLinear silently un-did the compute-dtype policy for
    # everything downstream (residuals, norms, attention einsums)
    y = y2.reshape(*B_shape, kernel.shape[1]).astype(x.dtype)
    return y, (x, kernel, s, b_pre, b_post)


def _fused_bwd(w_bits, a_bits, all_positive, interpret, res, g):
    x, kernel, s, b_pre, b_post = res
    a_lo, a_hi = thresholds(a_bits, all_positive)
    n_w = float(2 ** (w_bits - 1))
    gf = grad_scale_factor(x.shape, a_bits, all_positive, -2)
    x2, s_full, _ = _prep(x, s)
    g2 = g.reshape(-1, g.shape[-1]).astype(jnp.float32)
    sw = statsq_scale(kernel)
    wq = _wq_value(kernel, sw, n_w)

    u = (x2 + b_pre) / s_full
    in_range = (u >= a_lo) & (u <= a_hi)
    dxq = g2 @ wq.T
    dx2 = jnp.where(in_range, dxq, 0.0)
    db_pre = jnp.sum(dx2, axis=0)
    t = jnp.where(in_range, jnp.round(u) - u, jnp.clip(u, a_lo, a_hi))
    ds_elem = (t * dxq).reshape(*x.shape)
    axes = tuple(a for a in range(x.ndim) if a != x.ndim - 2)
    # zero the gradient where s was clipped below eps? clip_lower passes
    # identity grad in the reference, so no masking.
    ds = (jnp.sum(ds_elem, axis=axes) * gf).astype(s.dtype)

    # the matmul input of the composed form is (xq + b_post)
    xq = s_full * jnp.round(jnp.clip(u, a_lo, a_hi)) + b_post
    dkernel = (xq.T @ g2).astype(kernel.dtype)
    g_sum = jnp.sum(g2, axis=0)
    db_post = (g_sum @ wq.T).astype(b_post.dtype)
    dbias = g_sum
    dx = dx2.reshape(x.shape).astype(x.dtype)
    return dx, dkernel, ds, db_pre.astype(b_pre.dtype), db_post, dbias


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_qlinear(x, kernel, s, b_pre, b_post, bias=None, *,
                  w_bits: int, a_bits: int, all_positive: bool = False,
                  interpret: bool = False):
    """Fused QLinear forward (see module docstring).

    x: (..., n_tok, K); kernel: (K, N); s: (n_tok,) per-token LSQ scale;
    b_pre/b_post: (K,) LearnableBias shifts; bias: (N,) or None.
    """
    if bias is None:
        bias = jnp.zeros((kernel.shape[1],), jnp.float32)
    return _fused(x, kernel, s, b_pre, b_post, bias,
                  w_bits, a_bits, all_positive, interpret)
