"""Per-kernel oscillation tracking inside the jitted train step.

The reference's `TrackOscillation` (lsq.py:111-200) mutates module buffers
per forward; here the integer-domain weight images of every StatsQ-
quantized kernel are tracked as explicit state threaded through the step
(TrainState.extra['oscillation']), updated on-device, and surfaced as
scalar metrics — no host sync.

x_int is the pre-offset mid-rise integer: round(clip(w/s) * n - 0.5),
the exact integer image the StatsQ forward rounds (statsq.py:147).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..quant.oscillation import (
    OscillationState,
    init_oscillation_state,
    track_oscillation,
)
from ..quant.statsq import statsq_b4_round, statsq_scale
from .cga import is_cga_kernel


def weight_int_image(w: jax.Array, bits: int) -> jax.Array:
    """fp32 mid-rise integer image — the shared statsq_b4_round
    derivation, so tracking can never desynchronize from the levels the
    forward actually rounds (and stays exact under bf16 masters)."""
    b4_round, _ = statsq_b4_round(w, bits)
    return jnp.round(b4_round)


def _tracked_paths(params, *, qk_reparam: bool, model_type: str):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = []
    for path, w in flat:
        if is_cga_kernel(path, qk_reparam=qk_reparam, model_type=model_type):
            out.append(("/".join(getattr(p, "key", "") for p in path), path, w))
    return out


def init_oscillation_states(params, *, bits: int, qk_reparam: bool = False,
                            model_type: str = "deit") -> Dict[str, OscillationState]:
    states = {}
    for name, _, w in _tracked_paths(params, qk_reparam=qk_reparam,
                                     model_type=model_type):
        states[name] = init_oscillation_state(weight_int_image(w, bits))
    return states


def update_oscillation_states(
    params, states: Dict[str, OscillationState], *, bits: int,
    momentum: float = 0.01, freeze_threshold: float = 0.0,
    qk_reparam: bool = False, model_type: str = "deit",
) -> tuple[Dict[str, OscillationState], Dict[str, jax.Array]]:
    """One tracking step over all tracked kernels; returns (new states,
    aggregate metrics)."""
    new_states = dict(states)
    osc_sum = jnp.zeros(())
    osc_count = 0
    for name, _, w in _tracked_paths(params, qk_reparam=qk_reparam,
                                     model_type=model_type):
        if name not in states:
            continue
        x_int = weight_int_image(jax.lax.stop_gradient(w), bits)
        _, ns = track_oscillation(
            x_int, states[name], momentum=momentum,
            freeze_threshold=freeze_threshold)
        new_states[name] = ns
        osc_sum = osc_sum + jnp.sum(ns.ema_oscillation)
        osc_count += ns.ema_oscillation.size
    metrics = {
        "oscillation/ema_mean": osc_sum / max(osc_count, 1),
    }
    return new_states, metrics


def apply_frozen(old_params, new_params, states: Dict[str, OscillationState],
                 *, bits: int, qk_reparam: bool = False,
                 model_type: str = "deit"):
    """Pin frozen weights to the dequantized value of their FROZEN integer
    (round(ema_x_int)) — the optimizer-boundary counterpart of
    TrackOscillation's in-forward substitution (lsq.py:140-141): the real
    weight is set to the fixed point s*((x_int_frozen + 0.5)/n) so its
    StatsQ image equals the tracked frozen integer (up to scale drift from
    the still-training neighbors, which the reference shares)."""
    del old_params
    n = float(2 ** (bits - 1))

    def rebuild(path, new_leaf):
        if not is_cga_kernel(path, qk_reparam=qk_reparam,
                             model_type=model_type):
            return new_leaf
        name = "/".join(getattr(p, "key", "") for p in path)
        st = states.get(name)
        if st is None:
            return new_leaf
        # fp32 pinning math (frozen_x_int is an fp32 image); one final
        # cast back to the master dtype
        s = statsq_scale(new_leaf.astype(jnp.float32))
        pinned = (s * ((st.frozen_x_int + 0.5) / n)).astype(new_leaf.dtype)
        return jnp.where(st.frozen, pinned, new_leaf)

    return jax.tree_util.tree_map_with_path(rebuild, new_params)
