"""Fused quantized attention core: scores -> softmax -> LSQ -> @ v in VMEM.

The QAT attention tail materializes three (B, H, N, N) tensors per block
(attention logits, softmax probabilities, quantized probabilities) plus
the layout copies XLA inserts around them — measured at 25-30 ms of the
125 ms DeiT-S W2A2 step (profiler trace, docs/DESIGN.md §5).  This kernel
computes, per batch-row grid cell (all heads at once), entirely in VMEM:

    scores = lhs @ rhs^T * sm_scale          (MXU, f32 accumulation)
    p      = softmax(scores, axis=-1)        (f32)
    pq     = LSQ_all_positive(p; s)          (the reference's post-softmax
                                              quantizer, lsq.py:515-610
                                              with all_positive=True)
    out    = pq @ v

and writes only `out` (B, N, H, d).  The backward is flash-attention
style: scores/softmax/quantization are *recomputed* from (lhs, rhs, s)
per cell — trading ~0.3 TFLOP of recompute for ~12 GB/step of HBM
round-trips — and emits the exact cotangents of the composed reference
modules (STE round, in-range masking, per-row scale gradient; the
caller pre-applies the LSQ grad-scale factor via ste.grad_scale, exactly
like the XLA composition does).

Serves both attention families:
  * QKR (reference attention.py:200-210):  lhs = shared quantized input
    xq (B, N, C), rhs = quantized qkx (B, N, H, C) — d_lhs sums over
    heads inside the cell.
  * plain QAttention (attention.py:96-102):  lhs = q, rhs = k, both
    (B, N, H, d).

Block shapes keep every tensor in its natural (B, N, H, ·) layout (the
last two block dims equal the array dims, satisfying the Mosaic tiling
rule); head-axis moves happen in VMEM where they cost on-chip bandwidth
only.  Not supported in-kernel (callers fall back to the composition):
attention dropout > 0 (no shipped recipe uses it) and `qqkkvv` Gram
telemetry (needs the materialized probabilities anyway).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_S_EPS = 1e-5


def _scores(lhs, rhs, sm_scale):
    """(N,K) or (N,H,K) x (N,H,K) -> (H, N, M) f32 attention logits."""
    rhs_h = jnp.swapaxes(rhs, 0, 1)  # (H, M, K), VMEM-local move
    if lhs.ndim == 2:
        s = jax.lax.dot_general(
            rhs_h, lhs, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (H, M, N)
        return jnp.swapaxes(s, 1, 2) * sm_scale
    lhs_h = jnp.swapaxes(lhs, 0, 1)  # (H, N, K)
    return jax.lax.dot_general(
        lhs_h, rhs_h, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * sm_scale  # (H, N, M)


def _fwd_kernel(lhs_ref, rhs_ref, v_ref, s_ref, o_ref, *,
                sm_scale, thd_pos, quantize, out_dtype):
    scores = _scores(lhs_ref[0], rhs_ref[0], sm_scale)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    if quantize:
        s_row = jnp.maximum(s_ref[:].astype(jnp.float32), _S_EPS)[None, :, :]
        pq = jnp.round(jnp.clip(p / s_row, 0.0, thd_pos)) * s_row
    else:
        pq = p
    v_h = jnp.swapaxes(v_ref[0], 0, 1)  # (H, M, d)
    out = jax.lax.dot_general(
        pq.astype(v_h.dtype), v_h, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (H, N, d)
    o_ref[0] = jnp.swapaxes(out, 0, 1).astype(out_dtype)  # (N, H, d)


def _bwd_kernel(lhs_ref, rhs_ref, v_ref, s_ref, g_ref,
                dlhs_ref, drhs_ref, dv_ref, ds_ref, *,
                sm_scale, thd_pos, quantize):
    b = pl.program_id(0)
    lhs, rhs = lhs_ref[0], rhs_ref[0]
    scores = _scores(lhs, rhs, sm_scale)
    # recompute forward (flash-style)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    g_h = jnp.swapaxes(g_ref[0], 0, 1)  # (H, N, d)
    v_h = jnp.swapaxes(v_ref[0], 0, 1)  # (H, M, d)
    if quantize:
        s_row = jnp.maximum(s_ref[:].astype(jnp.float32), _S_EPS)[None, :, :]
        u = p / s_row
        in_range = u <= thd_pos  # lower bound 0 always holds for softmax
        uq = jnp.round(jnp.clip(u, 0.0, thd_pos))
        pq = uq * s_row
    else:
        pq = p
    # dv[h] = pq_h^T @ g_h ; dpq[h] = g_h @ v_h^T
    dv = jax.lax.dot_general(
        pq.astype(g_h.dtype), g_h, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (H, M, d)
    dv_ref[0] = jnp.swapaxes(dv, 0, 1).astype(dv_ref.dtype)
    dpq = jax.lax.dot_general(
        g_h, v_h, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (H, N, M)
    if quantize:
        # LSQ backward (all_positive): dx passes in-range, ds collects
        # round(u)-u inside, clamp bound outside (ofq_tpu/quant/lsq.py)
        dp = jnp.where(in_range, dpq, 0.0)
        t = jnp.where(in_range, uq - u,
                      jnp.asarray(float(thd_pos), jnp.float32))
        ds_part = jnp.sum(t * dpq, axis=(0, 2))[:, None]  # (N, 1)

        @pl.when(b == 0)
        def _():
            ds_ref[:] = jnp.zeros_like(ds_ref)

        ds_ref[:] += ds_part
    else:
        dp = dpq

        @pl.when(b == 0)
        def _():
            ds_ref[:] = jnp.zeros_like(ds_ref)

    # softmax backward: dscores = p * (dp - sum(dp * p))
    dscores = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dscores = (dscores * sm_scale).astype(rhs.dtype)  # (H, N, M)
    # d_rhs[h] = dscores_h^T @ lhs_h ; d_lhs[h] = dscores_h @ rhs_h
    lhs_h = (jnp.swapaxes(lhs, 0, 1) if lhs.ndim == 3
             else jnp.broadcast_to(lhs, (dscores.shape[0],) + lhs.shape))
    drhs = jax.lax.dot_general(
        dscores, lhs_h.astype(dscores.dtype), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (H, M, K)
    drhs_ref[0] = jnp.swapaxes(drhs, 0, 1).astype(drhs_ref.dtype)
    rhs_h = jnp.swapaxes(rhs, 0, 1)  # (H, M, K)
    dlhs = jax.lax.dot_general(
        dscores, rhs_h.astype(dscores.dtype), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (H, N, K)
    if lhs.ndim == 3:
        dlhs_ref[0] = jnp.swapaxes(dlhs, 0, 1).astype(dlhs_ref.dtype)
    else:
        # shared lhs (QKR's xq): sum the head contributions in-cell
        dlhs_ref[0] = jnp.sum(dlhs, axis=0).astype(dlhs_ref.dtype)


def _specs(N, H, K, d, lhs_per_head):
    lhs_spec = (
        pl.BlockSpec((1, N, H, K), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        if lhs_per_head else
        pl.BlockSpec((1, N, K), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM))
    rhs_spec = pl.BlockSpec((1, N, H, K), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, N, H, d), lambda b: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((N, 1), lambda b: (0, 0),
                          memory_space=pltpu.VMEM)
    return lhs_spec, rhs_spec, v_spec, s_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _attn_core(lhs, rhs, v, s, bits, sm_scale, quantize, interpret):
    out, _ = _attn_core_fwd(lhs, rhs, v, s, bits, sm_scale, quantize,
                            interpret)
    return out


def _attn_core_fwd(lhs, rhs, v, s, bits, sm_scale, quantize, interpret):
    B, N, H, K = rhs.shape
    d = v.shape[-1]
    lhs_per_head = lhs.ndim == 4
    thd_pos = 2 ** bits - 1
    lhs_spec, rhs_spec, v_spec, s_spec = _specs(N, H, K, d, lhs_per_head)
    s2 = s.reshape(N, 1).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, sm_scale=sm_scale, thd_pos=thd_pos,
            quantize=quantize, out_dtype=v.dtype),
        grid=(B,),
        in_specs=[lhs_spec, rhs_spec, v_spec, s_spec],
        out_specs=pl.BlockSpec((1, N, H, d), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, H, d), v.dtype),
        interpret=interpret,
    )(lhs, rhs, v, s2)
    return out, (lhs, rhs, v, s)


def _attn_core_bwd(bits, sm_scale, quantize, interpret, res, g):
    lhs, rhs, v, s = res
    B, N, H, K = rhs.shape
    d = v.shape[-1]
    lhs_per_head = lhs.ndim == 4
    thd_pos = 2 ** bits - 1
    lhs_spec, rhs_spec, v_spec, s_spec = _specs(N, H, K, d, lhs_per_head)
    g_spec = pl.BlockSpec((1, N, H, d), lambda b: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    s2 = s.reshape(N, 1).astype(jnp.float32)
    dlhs, drhs, dv, ds = pl.pallas_call(
        functools.partial(
            _bwd_kernel, sm_scale=sm_scale, thd_pos=thd_pos,
            quantize=quantize),
        grid=(B,),
        in_specs=[lhs_spec, rhs_spec, v_spec, s_spec, g_spec],
        out_specs=[
            lhs_spec,
            rhs_spec,
            v_spec,
            pl.BlockSpec((N, 1), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(lhs.shape, lhs.dtype),
            jax.ShapeDtypeStruct(rhs.shape, rhs.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
        ],
        interpret=interpret,
    )(lhs, rhs, v, s2, g)
    ds = ds.reshape(s.shape).astype(s.dtype)
    if not quantize:
        ds = jnp.zeros_like(s)
    return dlhs, drhs, dv, ds


_attn_core.defvjp(_attn_core_fwd, _attn_core_bwd)


def quantized_attention_core(
    lhs: jax.Array,
    rhs: jax.Array,
    v: jax.Array,
    s: jax.Array,
    *,
    bits: int,
    sm_scale: float,
    quantize_softmax: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Fused softmax(lsq(lhs @ rhs^T)) @ v (see module docstring).

    lhs: (B, N, K) shared across heads or (B, N, H, K) per-head;
    rhs: (B, N, H, K); v: (B, N, H, d); s: (N,) post-softmax LSQ scale
    (pass s with the grad-scale factor already applied via
    ofq_tpu.quant.ste.grad_scale, exactly like the XLA composition).
    Returns (B, N, H, d).
    """
    return _attn_core(lhs, rhs, v, s, bits, sm_scale, quantize_softmax,
                      interpret)
