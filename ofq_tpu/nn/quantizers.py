"""Flax wrappers for the functional quantizers.

The learned LSQ scale is a real parameter in the pytree with
*data-dependent* initialization: `model.init(rng, calibration_batch)`
materializes every scale from first-batch statistics — the explicit, seeded
replacement for the reference's lazy `init_from`-on-first-forward
(reference: lsq.py:544-569) and the `setup_alpha` calibration forward
(reference: train.py:997-1010).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..quant.lsq import init_scale, lsq_quantize
from ..quant.ste import at_least_f32


class LsqAct(nn.Module):
    """Learned-step-size activation fake-quantizer.

    channel_axis semantics follow the reference family:
      -2   -> per-token scale (`LsqQuantizer`, lsq.py:515)
      -1   -> per-channel scale (`LsqQuantizer4v`, lsq.py:701)
      None -> per-tensor scale (`LsqQuantizer4head_input`, lsq.py:448)
      1 on (B,H,N,d) -> per-head scale (`LsqQuantizer_only_headwise`,
           lsq.py:612-699: scale shape (H,), grad factor
           1/sqrt(thd_pos*B*N*d), init mean over all axes but H — the
           generic-axis machinery reproduces its formulas exactly;
           golden-tested in tests/test_quant_core.py)
      1 on (B,N,H,d) -> per-token scale in the transpose-free attention
           layout (numerically identical to -2 on (B,H,N,d))
    """

    bit: int
    all_positive: bool = False
    channel_axis: Optional[int] = -2
    learnable: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.bit >= 32:
            return x
        # scale init from >=fp32 first-batch statistics (promote-only: a
        # bf16 stream calibrates in fp32, the fp64 differential tests stay
        # fp64); the quantizer math itself runs in x's dtype
        s = self.param(
            "s",
            lambda rng: init_scale(x.astype(at_least_f32(x.dtype)), self.bit,
                                   self.all_positive, self.channel_axis),
        )
        if not self.learnable:
            s = jax.lax.stop_gradient(s)
        return lsq_quantize(
            x, s, self.bit,
            all_positive=self.all_positive,
            channel_axis=self.channel_axis,
        )


class LsqWeightIterativeFreezing(nn.Module):
    """LSQ weight quantizer with in-forward integer-domain oscillation
    tracking and freezing.

    Reference: lsq.py:202-304 (`LsqQuantizerWeight_iterative_freezing`) —
    present in the reference's quantizer surface but not wired into its
    module mappings; exposed here for the same capability.  Tracking state
    lives in the 'oscillation' variable collection (pass
    mutable=['oscillation'] during training forwards).
    """

    bit: int
    per_channel: bool = True
    learnable: bool = True
    freeze_momentum: float = 0.01
    freeze_threshold: float = 0.0

    @nn.compact
    def __call__(self, w: jax.Array, *, training: bool = False) -> jax.Array:
        from ..quant.lsq import lsq_quantize_composed, thresholds
        from ..quant.oscillation import (
            init_oscillation_state,
            track_oscillation,
        )
        from ..quant.ste import clip_lower, grad_scale, round_pass
        from ..quant.lsq import grad_scale_factor

        axis = -1 if self.per_channel else None
        w32 = w.astype(at_least_f32(w.dtype))
        s = self.param("s", lambda rng: init_scale(w32, self.bit, False, axis))
        if not self.learnable:
            s = jax.lax.stop_gradient(s)
        thd_neg, thd_pos = thresholds(self.bit, False)
        gf = grad_scale_factor(w32.shape, self.bit, False, axis)
        shape = [1] * w32.ndim
        if axis is not None:
            shape[axis] = s.shape[0]
        s_eff = grad_scale(clip_lower(s.reshape(shape), 1e-5), gf)
        x_int = round_pass(jnp.clip(w32 / s_eff, thd_neg, thd_pos))

        state = self.variable(
            "oscillation", "state",
            lambda: init_oscillation_state(jax.lax.stop_gradient(x_int)))
        if training and not self.is_initializing():
            x_int, new_state = track_oscillation(
                x_int, state.value, momentum=self.freeze_momentum,
                freeze_threshold=self.freeze_threshold)
            if not self.is_mutable_collection("oscillation"):
                raise ValueError(
                    "training forward needs mutable=['oscillation']")
            state.value = new_state
        else:
            # eval: apply freezing without tracking (skip_tracking=True path,
            # reference lsq.py:292-293)
            x_int = jnp.where(state.value.frozen, state.value.frozen_x_int,
                              x_int)
        return (x_int * s_eff).astype(w.dtype)


class LsqWeight(nn.Module):
    """LSQ weight fake-quantizer with scale initialized from the kernel.

    Used for the W8 classifier head and the full-LSQ alternative path
    (reference: lsq.py:20-109, `LsqQuantizerWeight`).  `channel_axis=-1`
    on (in, out) kernels == the reference's per-row scale on (out, in).
    `all_positive=True` (--wq_asym) selects the unsigned [0, 2^b-1] range
    with the factor-4 scale init (lsq.py:24-31, 54-55).
    """

    bit: int
    per_channel: bool = True
    learnable: bool = True
    all_positive: bool = False

    @nn.compact
    def __call__(self, w: jax.Array) -> jax.Array:
        if self.bit >= 32:
            return w
        axis = -1 if self.per_channel else None
        w32 = w.astype(at_least_f32(w.dtype))
        s = self.param(
            "s",
            lambda rng: init_scale(w32, self.bit, self.all_positive, axis))
        if not self.learnable:
            s = jax.lax.stop_gradient(s)
        y = lsq_quantize(w32, s, self.bit, all_positive=self.all_positive,
                         channel_axis=axis)
        return y.astype(w.dtype)
