"""StatsQ: statistical (non-learned) weight fake-quantization.

TPU-native, purely functional reimplementation of the reference's StatsQ
family (reference: src/quantization/quantizer/statsq.py:122-193).

Semantics preserved exactly:
  * per-output-row scale  s = 2 * mean(|W|)  recomputed from the live
    weights on every forward and detached (never learned),
  * scaled weights clamped to [-1, 1 - 1e-6]  (clip_val = 2.0),
  * mid-rise level set  q = (round(x * n - 0.5) + 0.5) / n,  n = 2^(b-1),
  * full straight-through gradient to the real weights.

Layout convention: unlike the reference's torch Linear (out, in) weights,
all kernels here follow the JAX/Flax convention `(in_features, out_features)`
— the per-output "row" statistics therefore reduce over axis 0 and broadcast
over axis 1.  The CGA variant's in-forward freeze-band mask replaces the
reference's Python loop over integer levels (statsq.py:183-185) with a
closed-form floor/fraction computation (provably equivalent for
boundary_range < 0.5; see tests/test_statsq.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ste import at_least_f32, passthrough

# Clamp epsilon of the reference implementation (statsq.py:145): scaled
# weights live in [-clip/2, clip/2 - 1e-6] with clip_val = 2.0.
_CLIP_HI_EPS = 1e-6


def statsq_scale(w: jax.Array, *, reduce_axis: int = 0) -> jax.Array:
    """Per-output-channel StatsQ scale `2 * mean(|w|)`, detached.

    For a 2-D `(in, out)` kernel this returns shape `(1, out)`.
    Reference: statsq.py:138 (with the (out, in) axes swapped for Flax
    layout).  A zero row would make the scale 0 and the forward NaN in the
    reference; we lower-bound by a tiny epsilon to stay finite (documented
    deviation — only reachable for an identically-zero output column).
    """
    s = 2.0 * jnp.mean(jnp.abs(w), axis=reduce_axis, keepdims=True)
    s = jnp.maximum(s, jnp.asarray(1e-12, w.dtype))
    return jax.lax.stop_gradient(s)


def statsq_b4_round(w: jax.Array, num_bits: int, *,
                    reduce_axis: int = 0) -> tuple[jax.Array, jax.Array]:
    """The pre-round mid-rise image `clip(w/s) * n - 0.5` and its scale,
    computed in fp32.

    This is the ONE derivation of the StatsQ integer image, shared by the
    forward level set (statsq_quantize), CGA's outer freeze mask
    (outer_freeze_mask) and the oscillation tracker
    (train/oscillation_hook.py) — a change to the level-set definition
    here reaches every consumer in lockstep.  Always fp32 regardless of
    the caller's dtype: under bf16 master weights a bf16 image has
    ulp 1.0 at n = 128, which can resolve neither the integer levels nor
    CGA's 0.005 rounding-decision band.
    """
    # promote (never demote): bf16 -> fp32 as documented above; fp64 input
    # at_least_f32: level rounding at fp32 under bf16 streams; a wrong
    # dtype here would seed level flips at scale
    w32 = w.astype(at_least_f32(w.dtype))
    s = statsq_scale(w32, reduce_axis=reduce_axis)
    clipped = jnp.clip(w32 / s, -1.0, 1.0 - _CLIP_HI_EPS)
    n = float(2 ** (num_bits - 1))
    return clipped * n - 0.5, s


def statsq_quantize(w: jax.Array, num_bits: int, *, reduce_axis: int = 0) -> jax.Array:
    """Fake-quantize a kernel with StatsQ. Gradient = identity (STE).

    Reference: statsq.py:133-150 (`StatsQuantizer.forward`).
    """
    b4_round, s = statsq_b4_round(w, num_bits, reduce_axis=reduce_axis)
    n = float(2 ** (num_bits - 1))
    q = (s * ((jnp.round(b4_round) + 0.5) / n)).astype(w.dtype)
    return passthrough(jax.lax.stop_gradient(q), w)


def statsq_quantize_4d(w: jax.Array, num_bits: int) -> jax.Array:
    """4-D StatsQ variant: one scale per axis-2 slice.

    Reference: statsq.py:196-219 (`StatsQuantizer_4d`, scale =
    2·mean over dims (0, 1, 3) for a (B, H, N, D) tensor — unused in the
    reference's main path but part of its public quantizer surface).
    """
    s = 2.0 * jnp.mean(jnp.abs(w), axis=(0, 1, 3), keepdims=True)
    s = jax.lax.stop_gradient(jnp.maximum(s, jnp.asarray(1e-12, w.dtype)))
    clipped = jnp.clip(w / s, -1.0, 1.0 - _CLIP_HI_EPS)
    n = float(2 ** (num_bits - 1))
    q = s * ((jnp.round(clipped * n - 0.5) + 0.5) / n)
    return passthrough(jax.lax.stop_gradient(q), w)


def cga_band_mask(
    b4_round: jax.Array,
    num_bits: int,
    boundary_range: float,
    *,
    level_lo: int | None = None,
    level_hi: int | None = None,
) -> jax.Array:
    """Boolean mask of entries whose pre-round value sits inside the
    rounding-decision band ("uncertain" weights that CGA keeps trainable).

    The reference loops over integer levels i in [level_lo, level_hi] and
    tests `b4_round - i` in `[0.5 - BR, 0.5 + BR]` (statsq.py:183-185,
    cga.py:465-468).  For BR < 0.5 the bands around distinct half-integers
    are disjoint, so membership is equivalent to
        floor(b4_round) in [level_lo, level_hi]   AND
        |frac(b4_round) - 0.5| <= BR
    which vectorizes with no Python loop and no data-dependent trip count.

    `level_lo/level_hi` default to the in-forward CGA range
    [-2^(b-1), 2^(b-1) - 2] (np.arange stop is exclusive, statsq.py:183).
    """
    if level_lo is None:
        level_lo = -(2 ** (num_bits - 1))
    if level_hi is None:
        level_hi = 2 ** (num_bits - 1) - 2
    floor = jnp.floor(b4_round)
    frac = b4_round - floor
    in_band = (frac >= 0.5 - boundary_range) & (frac <= 0.5 + boundary_range)
    in_range = (floor >= level_lo) & (floor <= level_hi)
    return in_band & in_range


def statsq_quantize_cga(
    w: jax.Array,
    num_bits: int,
    boundary_range: float,
    *,
    training: bool,
    reduce_axis: int = 0,
) -> jax.Array:
    """StatsQ with in-forward confidence-guided annealing.

    During training, weights whose pre-round value lies OUTSIDE the
    rounding-decision band are detached (their gradient is cut), so only
    oscillation-capable weights keep moving.
    Reference: statsq.py:154-193 (`StatsQuantizer_specific_4_qkreparam_cga`).
    """
    # The reference's in-forward band masking is gradient-inert: the masked
    # b4_round only feeds `quan_weights_no_grad`, which is then fully
    # detached before the STE passthrough `q.detach() - w.detach() + w`
    # (statsq.py:186-191).  Net observable behavior == plain StatsQ, for
    # both value and gradient — proven by tests/test_quant_core.py.  CGA's
    # real gradient effect lives in the outer optimizer transform
    # (ofq_tpu/train/cga.py).
    del boundary_range, training
    return statsq_quantize(w, num_bits, reduce_axis=reduce_axis)


def outer_freeze_mask(w: jax.Array, num_bits: int, boundary_range: float,
                      *, reduce_axis: int = 0) -> jax.Array:
    """CGA's *outer* freeze mask: 1.0 where a weight is FROZEN (confident),
    0.0 where it stays trainable.

    Reference: cga.py:450-469 (`freeze_outside_boundary_weight_idx`).  The
    level range there is data-dependent: np.arange(min(round), max(round))
    — inclusive of min, exclusive of max.  We compute the same range
    in-graph with jnp.min/max (floor must land in [min_r, max_r - 1]).
    """
    b4_round, _ = statsq_b4_round(w, num_bits, reduce_axis=reduce_axis)
    rounded = jnp.round(b4_round)
    min_r = jnp.min(rounded)
    max_r = jnp.max(rounded)
    floor = jnp.floor(b4_round)
    frac = b4_round - floor
    in_band = (frac >= 0.5 - boundary_range) & (frac <= 0.5 + boundary_range)
    in_range = (floor >= min_r) & (floor <= max_r - 1.0)
    keep_trainable = in_band & in_range
    # fp32 mask (exact 0/1) — the band test must run in fp32 even for
    # bf16 master weights; callers apply it dtype-preservingly (where)
    return 1.0 - keep_trainable.astype(jnp.float32)
