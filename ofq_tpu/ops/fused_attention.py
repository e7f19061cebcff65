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


def _units(x):
    """(WB, N, H, ...) -> (WB*H, N, ...): merge the block-row and head axes
    into one 'unit' batch axis so every dot below is a single-batch-dim
    batched matmul.  The (N, H) swap is a VMEM-local sublane move."""
    WB, N, H = x.shape[0], x.shape[1], x.shape[2]
    return x.transpose(0, 2, 1, 3).reshape((WB * H, N) + x.shape[3:])


def _lhs_units(lhs, H):
    """lhs (WB,N,K) shared-across-heads or (WB,N,H,K) -> (WB*H, N, K)
    in the same (wb, h) unit order as _units — the ONE place the
    shared-lhs head broadcast lives (fwd and bwd must agree on it)."""
    if lhs.ndim == 3:
        WB, N, K = lhs.shape
        return jnp.broadcast_to(
            lhs[:, None], (WB, H, N, K)).reshape(WB * H, N, K)
    return _units(lhs)


def _unit_scores(lhs, rhs, H, sm_scale):
    """lhs (WB,N,K) shared-across-heads or (WB,N,H,K); rhs (WB,N,H,K)
    -> (WB*H, N, M) f32 attention logits."""
    rhs_u = _units(rhs)  # (U, M, K)
    lhs_u = _lhs_units(lhs, H)
    return jax.lax.dot_general(
        lhs_u, rhs_u, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * sm_scale  # (U, N, M)


def _fwd_kernel(lhs_ref, rhs_ref, v_ref, s_ref, o_ref, *,
                sm_scale, thd_pos, quantize, out_dtype):
    WB, N, H, _ = rhs_ref.shape
    d = v_ref.shape[-1]
    scores = _unit_scores(lhs_ref[...], rhs_ref[...], H, sm_scale)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    if quantize:
        s_row = jnp.maximum(s_ref[:].astype(jnp.float32), _S_EPS)[None, :, :]
        pq = jnp.round(jnp.clip(p / s_row, 0.0, thd_pos)) * s_row
    else:
        pq = p
    v_u = _units(v_ref[...])  # (U, M, d)
    out = jax.lax.dot_general(
        pq.astype(v_u.dtype), v_u, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (U, N, d)
    o_ref[...] = out.reshape(WB, H, N, d).transpose(0, 2, 1, 3).astype(
        out_dtype)  # (WB, N, H, d)


def _bwd_kernel(lhs_ref, rhs_ref, v_ref, s_ref, g_ref,
                dlhs_ref, drhs_ref, dv_ref, ds_ref, *,
                sm_scale, thd_pos, quantize):
    b = pl.program_id(0)
    WB, N, H, K = rhs_ref.shape
    d = v_ref.shape[-1]
    lhs, rhs = lhs_ref[...], rhs_ref[...]
    scores = _unit_scores(lhs, rhs, H, sm_scale)  # (U, N, M)
    # recompute forward (flash-style)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    g_u = _units(g_ref[...])  # (U, N, d)
    v_u = _units(v_ref[...])  # (U, M, d)
    if quantize:
        s_row = jnp.maximum(s_ref[:].astype(jnp.float32), _S_EPS)[None, :, :]
        u = p / s_row
        in_range = u <= thd_pos  # lower bound 0 always holds for softmax
        uq = jnp.round(jnp.clip(u, 0.0, thd_pos))
        pq = uq * s_row
    else:
        pq = p
    # dv[u] = pq_u^T @ g_u ; dpq[u] = g_u @ v_u^T
    dv = jax.lax.dot_general(
        pq.astype(g_u.dtype), g_u, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (U, M, d)
    dv_ref[...] = dv.reshape(WB, H, N, d).transpose(0, 2, 1, 3).astype(
        dv_ref.dtype)
    dpq = jax.lax.dot_general(
        g_u, v_u, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (U, N, M)
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
    dscores = (dscores * sm_scale).astype(rhs.dtype)  # (U, N, M)
    # d_rhs[u] = dscores_u^T @ lhs_u ; d_lhs[u] = dscores_u @ rhs_u
    lhs_u = _lhs_units(lhs, H)
    drhs = jax.lax.dot_general(
        dscores, lhs_u.astype(dscores.dtype), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (U, M, K)
    drhs_ref[...] = drhs.reshape(WB, H, N, K).transpose(0, 2, 1, 3).astype(
        drhs_ref.dtype)
    rhs_u = _units(rhs)  # (U, M, K)
    dlhs = jax.lax.dot_general(
        dscores, rhs_u.astype(dscores.dtype), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (U, N, K)
    dlhs4 = dlhs.reshape(WB, H, N, K)
    if lhs.ndim == 4:
        dlhs_ref[...] = dlhs4.transpose(0, 2, 1, 3).astype(dlhs_ref.dtype)
    else:
        # shared lhs (QKR's xq): sum the head contributions in-cell
        dlhs_ref[...] = jnp.sum(dlhs4, axis=1).astype(dlhs_ref.dtype)


def _pick_block_rows(B, N, H, K, d, itemsize, tensors):
    """Rows per grid step.  One row per step (the round-2 design) makes the
    grid B steps of tiny DMAs — measured 7.7 ms on Swin window shapes where
    the math floor is ~0.2 ms, i.e. per-step overhead dominated.  Batch as
    many rows as keep the block operands around ~1 MB (VMEM holds the
    f32 score intermediates too, ~x(tensors) of that), sliced to a divisor
    of B so every block is full."""
    per_row = N * H * (2 * K + d) * itemsize + tensors * N * N * H * 4
    wb = max(1, min(64, int(1.5e6 // max(per_row, 1))))
    while B % wb:
        wb -= 1
    return wb


def _specs(WB, N, H, K, d, lhs_per_head):
    lhs_spec = (
        pl.BlockSpec((WB, N, H, K), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        if lhs_per_head else
        pl.BlockSpec((WB, N, K), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM))
    rhs_spec = pl.BlockSpec((WB, N, H, K), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((WB, N, H, d), lambda b: (b, 0, 0, 0),
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
    WB = _pick_block_rows(B, N, H, K, d, rhs.dtype.itemsize, tensors=2)
    lhs_spec, rhs_spec, v_spec, s_spec = _specs(WB, N, H, K, d, lhs_per_head)
    s2 = s.reshape(N, 1).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, sm_scale=sm_scale, thd_pos=thd_pos,
            quantize=quantize, out_dtype=v.dtype),
        grid=(B // WB,),
        in_specs=[lhs_spec, rhs_spec, v_spec, s_spec],
        out_specs=pl.BlockSpec((WB, N, H, d), lambda b: (b, 0, 0, 0),
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
    # bwd holds ~4 (U, N, M) f32 intermediates (scores/p/dpq/dscores)
    WB = _pick_block_rows(B, N, H, K, d, rhs.dtype.itemsize, tensors=4)
    lhs_spec, rhs_spec, v_spec, s_spec = _specs(WB, N, H, K, d, lhs_per_head)
    g_spec = pl.BlockSpec((WB, N, H, d), lambda b: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    s2 = s.reshape(N, 1).astype(jnp.float32)
    dlhs, drhs, dv, ds = pl.pallas_call(
        functools.partial(
            _bwd_kernel, sm_scale=sm_scale, thd_pos=thd_pos,
            quantize=quantize),
        grid=(B // WB,),
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
