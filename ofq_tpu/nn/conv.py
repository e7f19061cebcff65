"""W8A8 quantized patch-embedding convolution.

Reference: qlinear.py:138-191 (`LSQ_QConv2d`) — the patch-embed conv is
pinned to 8-bit LSQ weights + per-channel LSQ image input with spatial
LearnableBias4img shifts, regardless of the model's target bit-width
(modules/utils.py:68-84).

Layout is TPU-native NHWC with an HWIO kernel; a patchify conv with
stride == kernel == patch size maps onto the MXU as one big matmul.
The reference's runtime `signed` autodetection (lsq.py:336-355) is fixed
to signed=True here: the conv input is a normalized image, which is signed
from the first batch in every shipped recipe (documented deviation; the
observed signedness is still asserted at calibration).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .bias import ImageBias
from .quantizers import LsqAct, LsqWeight


class QPatchEmbedConv(nn.Module):
    """Patchify conv (stride = kernel = patch) with W8A8 LSQ fake-quant."""

    features: int
    patch_size: Tuple[int, int] = (16, 16)
    img_size: Tuple[int, int] = (224, 224)
    weight_bits: int = 8
    input_bits: int = 8
    aq_learnable: bool = True
    wq_learnable: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, H, W, C_in) NHWC
        c_in = x.shape[-1]
        kh, kw = self.patch_size
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, c_in, self.features), jnp.float32
        )
        x = ImageBias(*self.img_size, name="move_b4")(x)
        x = LsqAct(
            bit=self.input_bits,
            all_positive=False,  # signed: normalized images
            channel_axis=-1,     # per input channel (LsqQuantizer4img)
            learnable=self.aq_learnable,
            name="input_quant",
        )(x)
        x = ImageBias(*self.img_size, name="move_aft")(x)
        wq = LsqWeight(
            bit=self.weight_bits, per_channel=True,
            learnable=self.wq_learnable, name="weight_quant",
        )(kernel)
        y = jax.lax.conv_general_dilated(
            x, wq.astype(x.dtype),
            window_strides=(kh, kw),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        b = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        return y + b.astype(y.dtype)


class PatchEmbedConv(nn.Module):
    """Float patchify conv (timm PatchEmbed equivalent).

    Owns its kernel/bias directly so the param paths match the quantized
    QPatchEmbedConv (checkpoint conversion sees one layout).
    """

    features: int
    patch_size: Tuple[int, int] = (16, 16)
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.patch_size
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, c_in, self.features),
            jnp.float32)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=(kh, kw), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        b = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        return y + b.astype(y.dtype)
