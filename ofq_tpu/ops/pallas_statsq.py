"""Pallas TPU kernel: fused StatsQ weight fake-quant + matmul.

Under plain XLA every QLinear forward materializes the fake-quantized
weight in HBM (elementwise quantize pass -> write W_q -> matmul reads W_q),
and the backward reads it again for dx.  This kernel quantizes weight tiles
in VMEM on the way into the MXU, so W_q never touches HBM:

    fwd:  y[m, n]  = sum_k x[m, k] * Q(W)[k, n]
    bwd:  dx[m, k] = sum_n g[m, n] * Q(W)[k, n]      (fused, same trick)
          dW = x^T @ g (plain XLA; STE passes the cotangent through Q)

The per-output-column scale s = 2*mean_k |W[:, n]| is a single cheap XLA
reduction (reference semantics: statsq.py:138, detached).  Mid-rise level
math matches ofq_tpu.quant.statsq exactly; parity is enforced by
tests/test_pallas.py in interpret mode.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.statsq import _CLIP_HI_EPS, statsq_scale


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _quant_tile(w, s, n_levels):
    scaled = w / s
    clipped = jnp.clip(scaled, -1.0, 1.0 - _CLIP_HI_EPS)
    return s * ((jnp.round(clipped * n_levels - 0.5) + 0.5) / n_levels)


def _fwd_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_levels, out_dtype):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wq = _quant_tile(w_ref[:], s_ref[:], n_levels)
    acc_ref[:] += jnp.dot(
        x_ref[:], wq, preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _dx_kernel(g_ref, w_ref, s_ref, o_ref, acc_ref, *, n_levels, out_dtype):
    j = pl.program_id(2)  # reduction over N tiles

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wq = _quant_tile(w_ref[:], s_ref[:], n_levels)  # (TK, TN)
    # dx[m, k] = sum_n g[m, n] wq[k, n]
    acc_ref[:] += jax.lax.dot_general(
        g_ref[:], wq,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _tiles(M, K, N):
    TM = min(256, _round_up(M, 8))
    TN = min(256, _round_up(N, 128))
    TK = min(512, _round_up(K, 128))
    return TM, TN, TK


def _fwd_call(x2, w, s, bits, interpret):
    M, K = x2.shape
    N = w.shape[1]
    TM, TN, TK = _tiles(M, K, N)
    Mp, Kp, Np = _round_up(M, TM), _round_up(K, TK), _round_up(N, TN)
    xp = jnp.pad(x2, ((0, Mp - M), (0, Kp - K)))
    wp = jnp.pad(w, ((0, Kp - K), (0, Np - N)))
    # pad scales with 1s to avoid div-by-zero in dead columns
    sp = jnp.pad(s, ((0, 0), (0, Np - N)), constant_values=1.0)
    n_levels = float(2 ** (bits - 1))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_levels=n_levels,
                          out_dtype=x2.dtype),
        grid=(Mp // TM, Np // TN, Kp // TK),
        in_specs=[
            pl.BlockSpec((TM, TK), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, TN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x2.dtype),
        scratch_shapes=[pltpu.VMEM((TM, TN), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Kp * Np, transcendentals=0,
            bytes_accessed=4 * (Mp * Kp + Kp * Np + Mp * Np)),
        interpret=interpret,
    )(xp, wp, sp)
    return out[:M, :N]


def _dx_call(g2, w, s, bits, x_dtype, interpret):
    M, N = g2.shape
    K = w.shape[0]
    TM, TN, TK = _tiles(M, K, N)
    Mp, Kp, Np = _round_up(M, TM), _round_up(K, TK), _round_up(N, TN)
    gp = jnp.pad(g2, ((0, Mp - M), (0, Np - N)))
    wp = jnp.pad(w, ((0, Kp - K), (0, Np - N)))
    sp = jnp.pad(s, ((0, 0), (0, Np - N)), constant_values=1.0)
    n_levels = float(2 ** (bits - 1))
    out = pl.pallas_call(
        functools.partial(_dx_kernel, n_levels=n_levels, out_dtype=x_dtype),
        grid=(Mp // TM, Kp // TK, Np // TN),
        in_specs=[
            pl.BlockSpec((TM, TN), lambda i, k, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TK, TN), lambda i, k, j: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, k, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TK), lambda i, k, j: (i, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Kp), x_dtype),
        scratch_shapes=[pltpu.VMEM((TM, TK), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Kp * Np, transcendentals=0,
            bytes_accessed=4 * (Mp * Np + Kp * Np + Mp * Kp)),
        interpret=interpret,
    )(gp, wp, sp)
    return out[:M, :K]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _pallas_statsq_matmul(x2, w, bits, compute_dtype, interpret):
    if compute_dtype is not None:
        x2 = x2.astype(compute_dtype)
    s = statsq_scale(w)  # (1, N), detached
    return _fwd_call(x2, w, s, bits, interpret)


def _vjp_fwd(x2, w, bits, compute_dtype, interpret):
    if compute_dtype is not None:
        x2 = x2.astype(compute_dtype)
    s = statsq_scale(w)
    y = _fwd_call(x2, w, s, bits, interpret)
    return y, (x2, w, s)


def _vjp_bwd(bits, compute_dtype, interpret, res, g):
    x2, w, s = res
    # dx through the quantized weight (g @ Wq^T).  Measured on v5e the
    # XLA path wins here (the fused-NT pallas variant in _dx_call is kept
    # for experimentation): XLA fuses the quantize into the transposed
    # matmul's operand read well.
    wq = _quant_tile(w, s, float(2 ** (bits - 1)))
    if compute_dtype is not None:
        wq = wq.astype(compute_dtype)
    dx = jax.lax.dot_general(
        g, wq, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dW: STE identity through quantization -> plain x^T @ g
    dw = jax.lax.dot_general(
        x2, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(w.dtype)
    return dx.astype(x2.dtype), dw


_pallas_statsq_matmul.defvjp(_vjp_fwd, _vjp_bwd)


def pallas_statsq_matmul(x, kernel, bits, *, compute_dtype=None,
                         interpret: bool = False):
    """`x @ StatsQ(kernel)` with W_q kept in VMEM. x: (..., K)."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    y = _pallas_statsq_matmul(x2, kernel, bits, compute_dtype, interpret)
    return y.reshape(*lead, kernel.shape[1])
