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


class LsqAct(nn.Module):
    """Learned-step-size activation fake-quantizer.

    channel_axis semantics follow the reference family:
      -2   -> per-token scale (`LsqQuantizer`, lsq.py:515)
      -1   -> per-channel scale (`LsqQuantizer4v`, lsq.py:701)
      None -> per-tensor scale (`LsqQuantizer4head_input`, lsq.py:448)
    """

    bit: int
    all_positive: bool = False
    channel_axis: Optional[int] = -2
    learnable: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.bit >= 32:
            return x
        x32 = x.astype(jnp.float32)
        s = self.param(
            "s",
            lambda rng: init_scale(x32, self.bit, self.all_positive, self.channel_axis),
        )
        if not self.learnable:
            s = jax.lax.stop_gradient(s)
        y = lsq_quantize(
            x32, s, self.bit,
            all_positive=self.all_positive,
            channel_axis=self.channel_axis,
        )
        return y.astype(x.dtype)


class LsqWeight(nn.Module):
    """LSQ weight fake-quantizer with scale initialized from the kernel.

    Used for the W8 classifier head and the full-LSQ alternative path
    (reference: lsq.py:20-109, `LsqQuantizerWeight`).  `channel_axis=-1`
    on (in, out) kernels == the reference's per-row scale on (out, in).
    """

    bit: int
    per_channel: bool = True
    learnable: bool = True

    @nn.compact
    def __call__(self, w: jax.Array) -> jax.Array:
        if self.bit >= 32:
            return w
        axis = -1 if self.per_channel else None
        w32 = w.astype(jnp.float32)
        s = self.param("s", lambda rng: init_scale(w32, self.bit, False, axis))
        if not self.learnable:
            s = jax.lax.stop_gradient(s)
        y = lsq_quantize(w32, s, self.bit, all_positive=False, channel_axis=axis)
        return y.astype(w.dtype)
