"""Fused StatsQ weight-quantized matmul.

The single hottest composition in the framework: every QLinear forward pays
  scale = 2*mean|W|  ->  clamp  ->  mid-rise round  ->  dequant  ->  matmul
(reference: qlinear.py:58-73 + statsq.py:133-150).  Under plain XLA the
quantized weight round-trips HBM between the elementwise quantization and
the MXU matmul; the Pallas implementation (ofq_tpu/ops/pallas_statsq.py)
keeps the quantized tile in VMEM.

`impl` selects the backend:
  'xla'    — straight jnp composition (always available, used on CPU).
  'pallas' — fused TPU kernel.
Both share the same custom-VJP backward (STE: dW is the plain matmul
cotangent, the quantization Jacobian is identity; scale is detached).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..quant.statsq import statsq_quantize
from ..quant.ste import at_least_f32

_DEFAULT_IMPL = "xla"


def set_default_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    assert impl in ("xla", "pallas")
    _DEFAULT_IMPL = impl


def _quantize_weight(kernel: jax.Array, bits: int) -> jax.Array:
    return statsq_quantize(kernel, bits, reduce_axis=0)


def statsq_matmul(
    x: jax.Array,
    kernel: jax.Array,
    bits: int,
    *,
    impl: str | None = None,
    compute_dtype=None,
) -> jax.Array:
    """`x @ statsq_quantize(kernel)` with STE gradients.

    x: (..., in_features); kernel: (in_features, out_features).
    """
    impl = impl or _DEFAULT_IMPL
    if impl == "pallas":
        from .pallas_statsq import pallas_statsq_matmul

        return pallas_statsq_matmul(x, kernel, bits, compute_dtype=compute_dtype)
    wq = _quantize_weight(kernel, bits)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        wq = wq.astype(compute_dtype)
    y = jax.lax.dot_general(
        x, wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=at_least_f32(x.dtype),
    )
    # fp32 accumulation, compute-dtype stream
    return y.astype(compute_dtype) if compute_dtype is not None else y
