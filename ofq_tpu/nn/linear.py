"""Quantized dense layers and MLP.

TPU-native counterparts of the reference's quantized linear modules
(reference: src/quantization/modules/qlinear.py).  Instead of constructing
from a live torch module ("module surgery"), these are ordinary Flax
modules whose behavior is set by constructor fields; pretrained weights
arrive through the param pytree (checkpoint conversion), not `m.weight`
copies.

Kernel layout is Flax `(in_features, out_features)`; the reference's
per-output-row StatsQ scale therefore reduces over axis 0.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import statsq_matmul
from ..quant.ste import at_least_f32
from .bias import LearnableBias
from .quantizers import LsqAct, LsqWeight

Dtype = jnp.dtype


def _act_fn(name: str) -> Callable[[jax.Array], jax.Array]:
    return {
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "relu": jax.nn.relu,
        "None": lambda x: x,
        "identity": lambda x: x,
    }[name]


class PReLU(nn.Module):
    """torch.nn.PReLU semantics: one learnable slope (init 0.25) shared
    across channels (the reference's ACT_LAYER_MAPPINGS 'prelu',
    train.py:391-396, constructs nn.PReLU() with default num_parameters=1).
    """

    num_parameters: int = 1
    init_value: float = 0.25

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        a = self.param(
            "alpha",
            lambda rng: jnp.full((self.num_parameters,), self.init_value,
                                 jnp.float32))
        a = (a if self.num_parameters > 1 else a[0]).astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


class RPReLU(nn.Module):
    """ReActNet RPReLU: y = PReLU(x - move1) + move2 with per-channel
    learnable shifts and slopes.

    The reference declares an 'rprelu' act path (qlinear.py:110-131: the
    forward calls self.move1/self.act/self.move2) but never constructs
    those submodules, so selecting it upstream crashes with AttributeError;
    this is the working implementation of that declared intent.
    """

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        move1 = self.param("move1", nn.initializers.zeros, (self.dim,),
                           jnp.float32)
        slope = self.param(
            "alpha", lambda rng: jnp.full((self.dim,), 0.25, jnp.float32))
        move2 = self.param("move2", nn.initializers.zeros, (self.dim,),
                           jnp.float32)
        xs = x - move1.astype(x.dtype)
        y = jnp.where(xs >= 0, xs, slope.astype(x.dtype) * xs)
        return y + move2.astype(x.dtype)


def apply_act(name: str, x: jax.Array) -> jax.Array:
    """Apply the configured MLP activation (must run inside a compact
    module frame; prelu/rprelu register an 'act' child with params)."""
    if name == "prelu":
        return PReLU(name="act")(x)
    if name == "rprelu":
        return RPReLU(x.shape[-1], name="act")(x)
    return _act_fn(name)(x)


class _BiasParam(nn.Module):
    """Param container matching LearnableBias's tree path ('<name>/bias')."""

    dim: int

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param("bias", nn.initializers.zeros, (self.dim,),
                          jnp.float32)


class _ScaleParam(nn.Module):
    """Param container matching an LSQ quantizer's tree path ('<name>/s')
    with the same data-dependent init.  axis=-2 matches LsqAct's
    per-token activation scales ('input_quant/s'); axis=-1 matches
    LsqWeight's per-out-channel kernel scales ('weight_quant/s')."""

    bit: int
    all_positive: bool
    axis: int = -2

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..quant.lsq import init_scale
        from ..quant.ste import at_least_f32

        x32 = x.astype(at_least_f32(x.dtype))
        return self.param(
            "s", lambda rng: init_scale(x32, self.bit, self.all_positive,
                                        self.axis))


class QLinear(nn.Module):
    """StatsQ(weight) + bias->LSQ->bias(input) + matmul.

    Reference: qlinear.py:28-87 (`QLinear`).  `symmetric=False` selects an
    all-positive (unsigned) input quantizer — used for post-GELU fc2 inputs.

    matmul_impl:
      None/'xla'  — composed jnp ops (XLA fuses the chains),
      'pallas'    — fused StatsQ-weight matmul (W_q stays in VMEM),
      'fused'     — fully-fused LSQ-act + StatsQ-weight integer-core kernel
                    (ofq_tpu/ops/fused_qlinear.py); identical param tree.
    """

    features: int
    weight_bits: int = 8
    input_bits: int = 8
    symmetric: bool = True
    aq_learnable: bool = True
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    matmul_impl: Optional[str] = None
    compute_dtype: Optional[Dtype] = None
    # serving: kernel holds DEQUANTIZED StatsQ values of this many bits;
    # with the artifact's scale (kernel_scale param) the integer codes are
    # reconstructed exactly and the dot runs int8 (serve --int-core)
    frozen_int_bits: Optional[int] = None

    def _input_quant_params(self, x, in_features):
        """The input-quant param trio (move_b4 / input_quant / move_aft)
        shared by every non-composed branch below — ONE declaration so the
        checkpoint tree can never fork between matmul_impl settings (the
        composed path spells the same names via LearnableBias/LsqAct)."""
        b_pre = _BiasParam(in_features, name="move_b4")()
        s = _ScaleParam(self.input_bits, not self.symmetric,
                        name="input_quant")(x)
        if not self.aq_learnable:
            # no-op on the inference-only frozen path; matches
            # LsqAct(learnable=False) on the training paths
            s = jax.lax.stop_gradient(s)
        b_post = _BiasParam(in_features, name="move_aft")()
        return b_pre, s, b_post

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (in_features, self.features), jnp.float32
        )
        from ..ops.int8_qlinear import int8_eligible

        if (self.frozen_int_bits is not None and self.input_bits < 32
                and int8_eligible(self.frozen_int_bits, self.input_bits,
                                  not self.symmetric)):
            from ..ops.int8_qlinear import frozen_int8_forward

            b_pre, s, b_post = self._input_quant_params(x, in_features)
            w_scale = self.param("kernel_scale", nn.initializers.ones,
                                 (1, self.features), jnp.float32)
            y = frozen_int8_forward(
                x, kernel, w_scale, s, b_pre, b_post,
                w_bits=self.frozen_int_bits, a_bits=self.input_bits,
                all_positive=not self.symmetric)
            if self.use_bias:
                b = self.param("bias", self.bias_init, (self.features,),
                               jnp.float32)
                y = y + b.astype(y.dtype)
            return y
        if (self.matmul_impl == "fused" and self.input_bits < 32
                and self.weight_bits < 32):
            from ..ops.fused_qlinear import fused_qlinear

            b_pre, s, b_post = self._input_quant_params(x, in_features)
            bias = (self.param("bias", self.bias_init, (self.features,),
                               jnp.float32) if self.use_bias else None)
            return fused_qlinear(
                x, kernel, s, b_pre, b_post, bias,
                w_bits=self.weight_bits, a_bits=self.input_bits,
                all_positive=not self.symmetric)
        if self.matmul_impl == "int8" and self.input_bits < 32:
            from ..ops.int8_qlinear import int8_qlinear

            if int8_eligible(self.weight_bits, self.input_bits,
                             not self.symmetric):
                b_pre, s, b_post = self._input_quant_params(x, in_features)
                y = int8_qlinear(
                    x, kernel, s, b_pre, b_post,
                    self.weight_bits, self.input_bits, not self.symmetric)
                if self.use_bias:
                    b = self.param("bias", self.bias_init,
                                   (self.features,), jnp.float32)
                    y = y + b.astype(y.dtype)
                return y
            # ineligible bit-widths (W>4): fall through to the XLA path
        if self.input_bits < 32:
            x = LearnableBias(in_features, name="move_b4")(x)
            x = LsqAct(
                bit=self.input_bits,
                all_positive=not self.symmetric,
                channel_axis=-2,
                learnable=self.aq_learnable,
                name="input_quant",
            )(x)
            x = LearnableBias(in_features, name="move_aft")(x)
        if self.weight_bits < 32:
            y = statsq_matmul(
                x, kernel, self.weight_bits,
                impl=(self.matmul_impl
                      if self.matmul_impl not in ("fused", "int8") else None),
                compute_dtype=self.compute_dtype,
            )
        else:
            # weight quant disabled (w32 configs, or deploy mode where the
            # kernel already holds dequantized StatsQ values): keep the
            # compute-dtype semantics identical to the statsq_matmul path
            k2 = kernel
            if self.compute_dtype is not None:
                x = x.astype(self.compute_dtype)
                k2 = kernel.astype(self.compute_dtype)
            y = jax.lax.dot_general(
                x, k2, (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=at_least_f32(x.dtype))
            if self.compute_dtype is not None:
                y = y.astype(self.compute_dtype)
        if self.use_bias:
            b = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class LsqLinear(nn.Module):
    """Full-LSQ linear: learned-scale weights AND activations.

    Reference: qlinear.py:254-313 (`LSQ_w_and_act_QLinear`), selected when
    both quant modes are 'lsq'.
    """

    features: int
    weight_bits: int = 8
    input_bits: int = 8
    symmetric: bool = True
    aq_learnable: bool = True
    wq_learnable: bool = True
    weight_per_channel: bool = True
    wq_all_positive: bool = False  # --wq_asym: unsigned weight range
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    # serving: kernel holds DEQUANTIZED full-LSQ values of this many bits;
    # with the restored weight_quant/s param the integer codes are
    # reconstructed exactly and the dot runs int8 (serve --int-core)
    frozen_int_bits: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (in_features, self.features), jnp.float32
        )
        from ..ops.int8_qlinear import lsq_int8_eligible

        if (self.frozen_int_bits is not None and self.input_bits < 32
                and lsq_int8_eligible(self.frozen_int_bits, self.input_bits,
                                      not self.symmetric,
                                      self.wq_all_positive)):
            from ..ops.int8_qlinear import frozen_lsq_int8_forward

            b_pre = _BiasParam(in_features, name="move_b4")()
            s = _ScaleParam(self.input_bits, not self.symmetric,
                            name="input_quant")(x)
            if not self.aq_learnable:
                s = jax.lax.stop_gradient(s)
            b_post = _BiasParam(in_features, name="move_aft")()
            w_s = _ScaleParam(self.frozen_int_bits, self.wq_all_positive,
                              axis=-1, name="weight_quant")(kernel)
            y = frozen_lsq_int8_forward(
                x, kernel, w_s, s, b_pre, b_post,
                a_bits=self.input_bits,
                all_positive=not self.symmetric)
            if self.use_bias:
                b = self.param("bias", self.bias_init, (self.features,),
                               jnp.float32)
                y = y + b.astype(y.dtype)
            return y
        if self.input_bits < 32:
            x = LearnableBias(in_features, name="move_b4")(x)
            x = LsqAct(
                bit=self.input_bits,
                all_positive=not self.symmetric,
                channel_axis=-2,
                learnable=self.aq_learnable,
                name="input_quant",
            )(x)
            x = LearnableBias(in_features, name="move_aft")(x)
        wq = LsqWeight(
            bit=self.weight_bits,
            per_channel=self.weight_per_channel,
            learnable=self.wq_learnable,
            all_positive=self.wq_all_positive,
            name="weight_quant",
        )(kernel)
        y = x @ wq
        if self.use_bias:
            b = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class QHeadLinear(nn.Module):
    """W8A8 classifier head: per-tensor input LSQ + per-row weight LSQ.

    Reference: qlinear.py:193-252 (`LSQ_QLinear4head`); pinned to 8/8 bits
    by the surgery tables regardless of the target bit-width
    (modules/utils.py:85-101).
    """

    features: int
    weight_bits: int = 8
    input_bits: int = 8
    aq_learnable: bool = True
    wq_learnable: bool = True
    kernel_init: Callable = nn.initializers.zeros
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (in_features, self.features), jnp.float32
        )
        x = LearnableBias(in_features, name="move_b4")(x)
        x = LsqAct(
            bit=self.input_bits,
            all_positive=False,
            channel_axis=None,  # per-tensor (LsqQuantizer4head_input)
            learnable=self.aq_learnable,
            name="input_quant",
        )(x)
        x = LearnableBias(in_features, name="move_aft")(x)
        wq = LsqWeight(
            bit=self.weight_bits, per_channel=True,
            learnable=self.wq_learnable, name="weight_quant",
        )(kernel)
        y = x @ wq
        b = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        return y + b.astype(y.dtype)


class QMlp(nn.Module):
    """Quantized transformer MLP: fc1 (symmetric input) -> act -> fc2
    (asymmetric input, `symmetric=False`).

    Reference: qlinear.py:89-136 (`QMLP`); the fc2 asymmetry is qlinear.py:119.
    `lsq_weights=True` selects the full-LSQ pair (`LSQ_w_and_act_QMLP`,
    qlinear.py:315-363).
    """

    hidden_features: int
    out_features: int
    weight_bits: int = 8
    input_bits: int = 8
    aq_learnable: bool = True
    wq_learnable: bool = True
    act_layer: str = "gelu"
    dropout_rate: float = 0.0
    lsq_weights: bool = False
    wq_all_positive: bool = False
    matmul_impl: Optional[str] = None
    compute_dtype: Optional[Dtype] = None
    frozen_int_bits: Optional[int] = None  # serve --int-core passthrough

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        if self.lsq_weights:
            fc1 = LsqLinear(
                self.hidden_features, weight_bits=self.weight_bits,
                input_bits=self.input_bits, symmetric=True,
                aq_learnable=self.aq_learnable, wq_learnable=self.wq_learnable,
                wq_all_positive=self.wq_all_positive,
                frozen_int_bits=self.frozen_int_bits,
                name="fc1")
            fc2 = LsqLinear(
                self.out_features, weight_bits=self.weight_bits,
                input_bits=self.input_bits, symmetric=False,
                aq_learnable=self.aq_learnable, wq_learnable=self.wq_learnable,
                wq_all_positive=self.wq_all_positive,
                frozen_int_bits=self.frozen_int_bits,
                name="fc2")
        else:
            fc1 = QLinear(
                self.hidden_features, weight_bits=self.weight_bits,
                input_bits=self.input_bits, symmetric=True,
                aq_learnable=self.aq_learnable,
                matmul_impl=self.matmul_impl, compute_dtype=self.compute_dtype,
                frozen_int_bits=self.frozen_int_bits,
                name="fc1")
            fc2 = QLinear(
                self.out_features, weight_bits=self.weight_bits,
                input_bits=self.input_bits, symmetric=False,
                aq_learnable=self.aq_learnable,
                matmul_impl=self.matmul_impl, compute_dtype=self.compute_dtype,
                frozen_int_bits=self.frozen_int_bits,
                name="fc2")
        x = fc1(x)
        x = apply_act(self.act_layer, x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        x = fc2(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return x


class Mlp(nn.Module):
    """Float transformer MLP (reference: deit_vision_transformer.py:53-83)."""

    hidden_features: int
    out_features: int
    act_layer: str = "gelu"
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True) -> jax.Array:
        x = nn.Dense(self.hidden_features, name="fc1")(x)
        x = apply_act(self.act_layer, x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        x = nn.Dense(self.out_features, name="fc2")(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return x
