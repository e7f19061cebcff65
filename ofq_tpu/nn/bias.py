"""Learnable channel-shift biases applied around activation quantizers.

ReActNet-style shifts; the reference wraps every activation quantizer with a
`move_b4`/`move_aft` pair (reference: src/quantization/modules/qbias.py:5-23).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class LearnableBias(nn.Module):
    """Additive bias over the trailing feature axis (qbias.py:5-13)."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return x + b.astype(x.dtype)


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
