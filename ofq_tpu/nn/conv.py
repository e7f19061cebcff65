"""W8A8 quantized patch-embedding convolution.

Reference: qlinear.py:138-191 (`LSQ_QConv2d`) — the patch-embed conv is
pinned to 8-bit LSQ weights + per-channel LSQ image input with spatial
LearnableBias4img shifts, regardless of the model's target bit-width
(modules/utils.py:68-84).

Layout is TPU-native NHWC with an HWIO kernel; a patchify conv with
stride == kernel == patch size maps onto the MXU as one big matmul.
The reference's runtime `signed` autodetection (lsq.py:336-355) is kept:
a sticky boolean in the 'quant_stats' collection, initialized from the
calibration batch and flipped (never reset) whenever a training batch
contains negatives — the thresholds track it as traced values.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..quant.lsq import init_scale, lsq_quantize_dynamic_signed
from ..quant.ste import at_least_f32
from .bias import ImageBias
from .quantizers import LsqAct, LsqWeight


class LsqImgQuantizer(nn.Module):
    """Per-image-channel LSQ with runtime signedness autodetection.

    Reference: lsq.py:306-382 (`LsqQuantizer4img`): `signed` is a sticky
    buffer — zero until any input dips below -1e-5, one forever after —
    selecting unsigned [0, 2^b-1] vs signed [-2^(b-1), 2^(b-1)-1] ranges.
    The scale init always uses the factor-2 branch (ctor all_positive is
    never set, lsq.py:321-323).  State lives in 'quant_stats' (threaded
    like batch_stats: mutable during train steps, checkpoint-persisted).
    """

    bit: int
    learnable: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.bit >= 32:
            return x
        x32 = x.astype(at_least_f32(x.dtype))
        # stored as f32 0/1 (not bool) so full-variables grads stay legal
        batch_signed = (jnp.min(x32) < -1e-5).astype(jnp.float32)
        if (self.is_initializing()
                or self.has_variable("quant_stats", "signed")
                or self.is_mutable_collection("quant_stats")):
            signed_var = self.variable(
                "quant_stats", "signed", lambda: batch_signed)
            if (not self.is_initializing()
                    and self.is_mutable_collection("quant_stats")):
                signed_var.value = jnp.maximum(signed_var.value, batch_signed)
            signed = signed_var.value
        else:
            # caller supplied bare params without the quant_stats collection
            # (converted checkpoints, teacher twins): detect from the live
            # batch, exactly the reference's first-forward behavior
            signed = batch_signed
        s = self.param("s", lambda rng: init_scale(x32, self.bit, False, -1))
        if not self.learnable:
            s = jax.lax.stop_gradient(s)
        y = lsq_quantize_dynamic_signed(
            x32, s, self.bit, jax.lax.stop_gradient(signed != 0),
            channel_axis=-1)
        return y.astype(x.dtype)


def _patchify(x: jax.Array, kh: int, kw: int) -> jax.Array:
    """Space-to-depth: (B, nh*kh, nw*kw, C) -> (B, nh, nw, kh*kw*C).

    A patchify conv (stride == kernel, VALID) is exactly this reshape
    followed by a matmul with the (kh*kw*C, F)-flattened kernel.  On TPU
    the matmul form is much faster than `conv_general_dilated`: the conv
    lowers with the 3-channel image dim on the 128-lane axis (42x lane
    waste) and its input-backward — required here because the image bias
    and LSQ4img scale are trainable — lowers to a pathological transposed
    conv (~39 ms/step measured, 24% of the whole train step).  The
    flattened dim (kh*kw*C) is lane-friendly and both backward matmuls
    tile cleanly onto the MXU.
    """
    B, H, W, C = x.shape
    nh, nw = H // kh, W // kw
    # VALID stride=kernel conv semantics: truncate any remainder rows/cols
    # (e.g. --img-size 230 with patch 16 keeps the top-left 224x224)
    if H != nh * kh or W != nw * kw:
        x = x[:, :nh * kh, :nw * kw]
    x = x.reshape(B, nh, kh, nw, kw, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, nh, nw, kh * kw * C)


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
        x = LsqImgQuantizer(
            bit=self.input_bits,
            learnable=self.aq_learnable,
            name="input_quant",
        )(x)
        x = ImageBias(*self.img_size, name="move_aft")(x)
        wq = LsqWeight(
            bit=self.weight_bits, per_channel=True,
            learnable=self.wq_learnable, name="weight_quant",
        )(kernel)
        patches = _patchify(x, kh, kw)
        w2 = wq.reshape(kh * kw * c_in, self.features).astype(x.dtype)
        y = jax.lax.dot_general(
            patches, w2,
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=at_least_f32(x.dtype),
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
        patches = _patchify(x, kh, kw)
        w2 = kernel.reshape(kh * kw * c_in, self.features).astype(x.dtype)
        y = jax.lax.dot_general(
            patches, w2,
            dimension_numbers=(((3,), (0,)), ((), ())),
            preferred_element_type=at_least_f32(x.dtype))
        b = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        return y + b.astype(y.dtype)
