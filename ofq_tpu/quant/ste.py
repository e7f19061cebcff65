"""Straight-through-estimator primitives for fake quantization.

TPU-native reimplementation of the STE helpers used throughout the reference
quantizers (reference: src/quantization/quantizer/lsq.py:6-18 and
statsq.py:13-29).  All functions are pure and jit/vmap/grad-safe; the
"detach arithmetic" of the reference becomes `jax.lax.stop_gradient`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def round_pass(x: jax.Array) -> jax.Array:
    """Round to nearest (ties-to-even) with identity gradient.

    Reference: lsq.py:11-14 (`round_pass`).  `jnp.round` and `torch.round`
    both implement banker's rounding, so level sets match bit-exactly.
    """
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def grad_scale(x: jax.Array, scale) -> jax.Array:
    """Identity forward; gradient multiplied by `scale`.

    Reference: lsq.py:6-9 (`grad_scale`).  Used to scale the LSQ step-size
    gradient by 1/sqrt(thd_pos * numel).
    """
    return x * scale + jax.lax.stop_gradient(x - x * scale)


def clip_lower(x: jax.Array, eps) -> jax.Array:
    """Lower-bound `x` at `eps` in the forward pass, identity gradient.

    Reference: lsq.py:16-18 (`clip`): forward value is `where(x > eps, x, eps)`
    but the gradient passes through unchanged even in the clipped region
    (unlike `maximum`, which would zero it).
    """
    clipped = jnp.where(x > eps, x, eps)
    return x + jax.lax.stop_gradient(clipped - x)


def at_least_f32(dtype) -> jnp.dtype:
    """Promote, never demote: the quantizer-math / accumulation dtype.

    Quantizer arithmetic (scale fits, level rounding, clip boundaries) and
    dot accumulation must run at >=fp32 under a bf16 compute stream — and
    stay fp64 under a double-precision differential run so comparisons
    against a double()'d reference model are decisive.  One definition so
    the invariant can't drift per call site; use as
    `x.astype(at_least_f32(x.dtype))` or
    `preferred_element_type=at_least_f32(x.dtype)`.
    """
    return jnp.promote_types(dtype, jnp.float32)


def passthrough(target: jax.Array, x: jax.Array) -> jax.Array:
    """Forward `target`, but gradients flow to `x` with identity Jacobian.

    Encodes the reference's `target.detach() - x.detach() + x` idiom
    (e.g. statsq.py:148), used so quantized weights get the full
    straight-through gradient of the real weights.
    """
    return x + jax.lax.stop_gradient(target - x)
