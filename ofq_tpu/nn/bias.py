"""Learnable channel-shift biases applied around activation quantizers.

ReActNet-style shifts; the reference wraps every activation quantizer with a
`move_b4`/`move_aft` pair (reference: src/quantization/modules/qbias.py:5-23).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


@jax.custom_vjp
def _bias_add(x: jax.Array, b: jax.Array) -> jax.Array:
    return x + b.astype(x.dtype)


def _bias_add_fwd(x, b):
    return x + b.astype(x.dtype), b.ndim


def _bias_add_bwd(res, g):
    # db accumulates in fp32 even under the bf16 stream (the convert fuses
    # into the reduce); a raw bf16 sum over B*N terms loses low bits.
    # The bias param is always fp32, so no residuals are needed.
    ndim_b = res
    db = jnp.sum(g.astype(jnp.float32), axis=tuple(range(g.ndim - ndim_b)))
    return g, db


_bias_add.defvjp(_bias_add_fwd, _bias_add_bwd)


class LearnableBias(nn.Module):
    """Additive bias over the trailing feature axis (qbias.py:5-13).

    `apply_shape` (optional) reshapes the stored flat (dim,) param to a
    trailing multi-axis shape at apply time — e.g. (H, C) on a 4-D
    (B, N, H, C) tensor — so callers can stay in the tensor's natural
    einsum layout instead of flattening to (B, N, H*C) (which costs a
    materialized layout copy per call on TPU).  The param tree is
    unchanged: still one flat `bias` of size dim."""

    dim: int
    apply_shape: tuple = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        if self.apply_shape is not None:
            b = b.reshape(self.apply_shape)
        return _bias_add(x, b)


class ImageBias(nn.Module):
    """Additive spatial bias for NHWC images, one value per (h, w) position.

    The reference stores a flat 224*224 vector reshaped to (H, W) and
    broadcast over batch and channels (qbias.py:15-23, LearnableBias4img).
    """

    height: int
    width: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b = self.param(
            "bias", nn.initializers.zeros, (self.height, self.width), jnp.float32
        )
        return x + b[None, :, :, None].astype(x.dtype)
