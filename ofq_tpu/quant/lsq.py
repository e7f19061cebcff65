"""LSQ (Learned Step-size Quantization) fake-quant, functional core.

TPU-native reimplementation of the reference's LSQ quantizer family
(reference: src/quantization/quantizer/lsq.py).  The reference has six
near-identical classes differing only in which axes carry the learned scale
and how the scale is initialized; here they collapse into ONE pure function
parameterized by a `channel_axis`, plus init helpers.  The learned scale `s`
is an ordinary parameter in the pytree (owned by the calling Flax module),
so the reference's lazy `init_from`-on-first-forward becomes data-dependent
Flax init (see ofq_tpu/nn/*).

Scale-axis conventions preserved from the reference:
  * `LsqQuantizer` (lsq.py:515-610):  s indexed by axis -2 — the *token*
    axis for (B, N, C) and (B, H, N, d) activations ("quantize along N").
  * `LsqQuantizer4v` (lsq.py:701-800):  s on axis -1 (true per-channel).
  * per-tensor variants: scalar s.
Gradient scaling of s is 1/sqrt(thd_pos * numel_per_group), matching
lsq.py:582-591 per shape.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp

from .ste import clip_lower, grad_scale, round_pass

_S_EPS = 1e-5  # lower bound on the learned scale (lsq.py:92)


def thresholds(bit: int, all_positive: bool) -> tuple[int, int]:
    """Integer range [thd_neg, thd_pos] for a bit-width (lsq.py:519-534)."""
    if all_positive:
        if bit == 1:
            return 0, 1
        return 0, 2**bit - 1
    if bit == 1:
        return -1, 1
    return -(2 ** (bit - 1)), 2 ** (bit - 1) - 1


def _broadcast_scale(s: jax.Array, x_shape: Sequence[int],
                     channel_axis) -> jax.Array:
    """Reshape a flat (or scalar) scale so it broadcasts along channel_axis.

    channel_axis may be a single axis or a TUPLE of axes — the tuple form
    carries one scale entry per index combination of those axes (stored
    flat, row-major), letting e.g. the QKR qkx chain quantize per
    (token, head) directly on the 4-D (B, N, H, C) einsum output instead
    of forcing a (B, N*H, C) reshape (which materializes a layout copy of
    a 116 MB tensor twice per block — see docs/DESIGN.md §5d)."""
    if channel_axis is None or s.ndim == 0 or s.size == 1:
        return jnp.reshape(s, ())
    x_ndim = len(x_shape)
    shape = [1] * x_ndim
    if isinstance(channel_axis, tuple):
        for a in channel_axis:
            shape[a % x_ndim] = x_shape[a % x_ndim]
    else:
        shape[channel_axis] = s.shape[0]
    return jnp.reshape(s, shape)


def _scale_axes(channel_axis, ndim: int) -> tuple:
    """Normalized set of axes that carry scale entries."""
    if channel_axis is None:
        return ()
    axes = channel_axis if isinstance(channel_axis, tuple) else (channel_axis,)
    return tuple(a % ndim for a in axes)


def grad_scale_factor(x_shape: Sequence[int], bit: int, all_positive: bool,
                      channel_axis: int | None) -> float:
    """1/sqrt(thd_pos * group_numel), matching the reference per shape.

    Reference (lsq.py:582-591 for axis -2 scales; lsq.py:774-781 for axis -1;
    lsq.py:90 per-tensor):  group_numel is the number of elements sharing one
    scale entry EXCEPT that the reference idiosyncratically omits some axes —
    we reproduce its exact formulas:
      per-tensor:                 numel(x)
      axis -2, 2-D (N, C):        C
      axis -2, 3-D (B, N, C):     B * C
      axis -2, 4-D (B, H, N, d):  B * H * d
      axis -1, 3-D (B, N, C):     B * N
      axis -1, 4-D (B, H, N, d):  B * H * N
    """
    _, thd_pos = thresholds(bit, all_positive)
    nd = len(x_shape)
    if channel_axis is None:
        numel = math.prod(x_shape)
    elif channel_axis in (-2, nd - 2):
        if nd == 2:
            numel = x_shape[-1]
        elif nd == 3:
            numel = x_shape[0] * x_shape[-1]
        elif nd == 4:
            numel = x_shape[0] * x_shape[1] * x_shape[-1]
        else:
            raise ValueError(f"unsupported ndim {nd} for axis -2 LSQ")
    elif channel_axis in (-1, nd - 1):
        if nd == 2:
            # 2-D (in, out) weight kernels: group = the input dim
            # (LsqQuantizerWeight, lsq.py:87 with torch (out, in) layout).
            numel = x_shape[0]
        elif nd == 3:
            numel = x_shape[0] * x_shape[1]
        elif nd == 4:
            numel = x_shape[0] * x_shape[1] * x_shape[2]
        else:
            raise ValueError(f"unsupported ndim {nd} for axis -1 LSQ")
    else:
        # generic (incl. tuple axes): all elements sharing one scale entry
        axes = channel_axis if isinstance(channel_axis, tuple) else (
            channel_axis,)
        numel = math.prod(x_shape)
        for a in axes:
            numel //= x_shape[a % nd]
    return 1.0 / math.sqrt(thd_pos * numel)


def init_scale(x: jax.Array, bit: int, all_positive: bool,
               channel_axis: int | None) -> jax.Array:
    """Data-dependent init of the LSQ scale from first-batch statistics.

    signed:       2 * mean|x| / sqrt(thd_pos)      (lsq.py:547-554)
    all_positive: 4 * mean|x| / sqrt(thd_pos)
    per-tensor:   always 2 * mean|x| / sqrt(thd_pos) (lsq.py:562 — the
                  reference per-tensor branch ignores all_positive).
    The mean reduces over every axis except `channel_axis`.
    """
    _, thd_pos = thresholds(bit, all_positive)
    if channel_axis is None:
        factor = 2.0
        m = jnp.mean(jnp.abs(x))
        s = (factor * m / math.sqrt(thd_pos)).reshape(1)
    else:
        factor = 4.0 if all_positive else 2.0
        keep = _scale_axes(channel_axis, x.ndim)
        m = jnp.mean(jnp.abs(x),
                     axis=tuple(a for a in range(x.ndim) if a not in keep))
        # tuple-axis scales are stored FLAT (row-major over the kept axes)
        # so the param tree is identical to the reshape-based formulation
        s = (factor * m / math.sqrt(thd_pos)).reshape(-1)
    # round through float32: the reference's setup_alpha materializes s as
    # a float32 Parameter REGARDLESS of model dtype (torch.zeros(...,
    # device="cuda") default dtype + copy_, lsq.py:556-569) — a no-op in
    # f32/bf16 production, and required for the fp64 model-level
    # calibration differential, where f64-exact scales here would seed
    # ~5e-8 forward divergence that W4's level grid amplifies through
    # depth (tests/test_calibration_differential.py).
    return s.astype(jnp.float32).astype(s.dtype)


def lsq_quantize_composed(
    x: jax.Array,
    s: jax.Array,
    bit: int,
    *,
    all_positive: bool = False,
    channel_axis: int | None = -2,
) -> jax.Array:
    """LSQ fake-quantization with learned scale `s` (autodiff composition).

    Matches `LsqQuantizer.forward` (lsq.py:571-602): the scale is clipped
    below at 1e-5 with identity grad, its gradient is scaled by
    `grad_scale_factor`, the value is clamped to [thd_neg, thd_pos] and
    rounded with STE.  bit == 1 and signed -> sign(x) binarization.
    """
    thd_neg, thd_pos = thresholds(bit, all_positive)
    g = grad_scale_factor(x.shape, bit, all_positive, channel_axis)
    s_b = _broadcast_scale(s, x.shape, channel_axis)
    # the quantizer math runs in x's dtype (bf16 under the compute-dtype
    # stream — integer levels are exact in bf16, the dequant multiply is
    # one rounding); the scale param itself stays fp32 in the pytree
    s_eff = grad_scale(clip_lower(s_b, _S_EPS), g).astype(x.dtype)
    y = x / s_eff
    if bit == 1 and not all_positive:
        y = jnp.sign(y)
    else:
        y = jnp.clip(y, thd_neg, thd_pos)
        y = round_pass(y)
    return y * s_eff


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _lsq_fused(x, s, bit, all_positive, channel_axis):
    return lsq_quantize_composed(
        x, s, bit, all_positive=all_positive, channel_axis=channel_axis)


def _lsq_fused_fwd(x, s, bit, all_positive, channel_axis):
    y = lsq_quantize_composed(
        x, s, bit, all_positive=all_positive, channel_axis=channel_axis)
    return y, (x, s)


def _lsq_fused_bwd(bit, all_positive, channel_axis, res, g):
    """One fused pass over (x, g): dx = g·[in-range]; ds via the standard
    LSQ gradient (round(u)−u inside, clamp bound outside), scale-grad
    factor applied — exactly the cotangents of the composed form (the
    residuals are just (x, s) instead of autodiff's intermediates)."""
    x, s = res
    thd_neg, thd_pos = thresholds(bit, all_positive)
    gf = grad_scale_factor(x.shape, bit, all_positive, channel_axis)
    s_b = _broadcast_scale(s, x.shape, channel_axis)
    s_eff = jnp.where(s_b > _S_EPS, s_b, _S_EPS).astype(x.dtype)
    u = x / s_eff
    in_range = (u >= thd_neg) & (u <= thd_pos)
    dx = jnp.where(in_range, g, jnp.zeros((), g.dtype))
    # elementwise in x's dtype, accumulation in fp32 (the convert fuses
    # into the reduce — no fp32 materialization)
    ds_elem = (jnp.where(in_range, jnp.round(u) - u,
                         jnp.clip(u, thd_neg, thd_pos)) * g
               ).astype(jnp.float32)
    if channel_axis is None:
        ds = jnp.sum(ds_elem).reshape(s.shape) * gf
    else:
        keep = _scale_axes(channel_axis, x.ndim)
        axes = tuple(a for a in range(x.ndim) if a not in keep)
        ds = jnp.sum(ds_elem, axis=axes).reshape(s.shape) * gf
    return dx, ds.astype(s.dtype)


_lsq_fused.defvjp(_lsq_fused_fwd, _lsq_fused_bwd)


def lsq_quantize(
    x: jax.Array,
    s: jax.Array,
    bit: int,
    *,
    all_positive: bool = False,
    channel_axis: int | None = -2,
) -> jax.Array:
    """LSQ fake-quant; fused custom-VJP for bit > 1 (saves the autodiff
    intermediates — the dominant HBM cost of QAT backward), composed
    autodiff for the bit==1 sign path (whose torch gradient is zero
    through sign, preserved by composition)."""
    if bit == 1 and not all_positive:
        return lsq_quantize_composed(
            x, s, bit, all_positive=all_positive, channel_axis=channel_axis)
    return _lsq_fused(x, s, bit, all_positive, channel_axis)


def lsq_quantize_dynamic_signed(
    x: jax.Array,
    s: jax.Array,
    bit: int,
    signed: jax.Array,
    *,
    channel_axis: int | None = -1,
) -> jax.Array:
    """LSQ fake-quant whose signed/unsigned range is a *traced* boolean.

    Backs the reference's `LsqQuantizer4img` runtime signedness
    autodetection (lsq.py:336-355): the per-image-channel quantizer keeps a
    sticky `signed` buffer flipped by the data, so the integer range is
    [0, 2^b-1] until a negative input appears and [-2^(b-1), 2^(b-1)-1]
    after.  Because `signed` is data-dependent state (not a static flag),
    the thresholds and the scale-gradient factor are computed with lax ops
    and the quantizer uses the composed autodiff form (this runs once per
    step on the patch-embed input — negligible cost).
    """
    thd_neg = jnp.where(signed, -(2 ** (bit - 1)), 0)
    thd_pos = jnp.where(signed, 2 ** (bit - 1) - 1, 2 ** bit - 1)
    if channel_axis is None:
        numel = math.prod(x.shape)
    else:
        # reference 4-D formula: thd_pos * B*H*W (lsq.py:363)
        numel = math.prod(x.shape) // x.shape[channel_axis % x.ndim]
    g = 1.0 / jnp.sqrt(thd_pos.astype(jnp.float32) * numel)
    s_b = _broadcast_scale(s, x.shape, channel_axis)
    s_eff = grad_scale(clip_lower(s_b, _S_EPS), g)
    y = jnp.clip(x / s_eff, thd_neg, thd_pos)
    y = round_pass(y)
    return y * s_eff
