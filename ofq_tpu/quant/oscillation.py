"""Oscillation tracking in the integer domain, as pure state updates.

TPU-native equivalent of the reference's `TrackOscillation` module
(reference: src/quantization/quantizer/lsq.py:111-200, duplicated in
statsq.py:32-120).  The reference mutates buffers on a module; here the
state is an explicit pytree threaded through the jitted train step, so
tracking runs on-device with no host sync.

Semantics preserved:
  * delta = round(prev_int - int)  -> switch_dir = sign(delta)
  * oscillated where prev_switch_dir * switch_dir == -1
  * EMA of the oscillation indicator with `momentum`
  * optional freezing: once ema > threshold the weight's integer value is
    pinned (to round(ema_x_int) if use_ema_x_int else the current value).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class OscillationState(NamedTuple):
    prev_x_int: jax.Array
    prev_switch_dir: jax.Array
    ema_oscillation: jax.Array
    total_oscillation: jax.Array
    ema_x_int: jax.Array
    frozen: jax.Array        # bool mask
    frozen_x_int: jax.Array
    iters: jax.Array         # scalar int32


def init_oscillation_state(x_int: jax.Array) -> OscillationState:
    z = jnp.zeros_like(x_int)
    return OscillationState(
        prev_x_int=x_int,
        prev_switch_dir=z,
        ema_oscillation=z,
        total_oscillation=z,
        ema_x_int=x_int,
        frozen=jnp.zeros(x_int.shape, dtype=bool),
        frozen_x_int=z,
        iters=jnp.zeros((), dtype=jnp.int32),
    )


def track_oscillation(
    x_int: jax.Array,
    state: OscillationState,
    *,
    momentum: float = 0.01,
    freeze_threshold: float = 0.0,
    use_ema_x_int: bool = True,
) -> tuple[jax.Array, OscillationState]:
    """One tracking step. Returns (possibly-frozen x_int, new state)."""
    # Apply freezing first (reference lsq.py:140-141).
    x_int = jnp.where(state.frozen, state.frozen_x_int, x_int)

    x_det = jax.lax.stop_gradient(x_int)
    delta = jnp.round(state.prev_x_int - x_det)
    switch_dir = jnp.sign(delta)
    switched = delta != 0
    oscillated = (state.prev_switch_dir * switch_dir) == -1
    ema_osc = momentum * oscillated + (1 - momentum) * state.ema_oscillation
    prev_switch_dir = jnp.where(switched, switch_dir, state.prev_switch_dir)
    total = state.total_oscillation + oscillated

    frozen = state.frozen
    frozen_x_int = state.frozen_x_int
    ema_x_int = state.ema_x_int
    if freeze_threshold > 0:
        newly = ema_osc > freeze_threshold
        frozen = frozen | newly
        if use_ema_x_int:
            frozen_x_int = jnp.where(newly, jnp.round(state.ema_x_int), frozen_x_int)
            ema_x_int = momentum * x_det + (1 - momentum) * state.ema_x_int
        else:
            frozen_x_int = jnp.where(newly, x_det, frozen_x_int)

    new_state = OscillationState(
        prev_x_int=x_det,
        prev_switch_dir=prev_switch_dir,
        ema_oscillation=ema_osc,
        total_oscillation=total,
        ema_x_int=ema_x_int,
        frozen=frozen,
        frozen_x_int=frozen_x_int,
        iters=state.iters + 1,
    )
    return x_int, new_state


def oscillation_metrics(state: OscillationState) -> dict[str, jax.Array]:
    """Scalar telemetry for logging inside the train step."""
    return {
        "oscillation/ema_mean": jnp.mean(state.ema_oscillation),
        "oscillation/ema_max": jnp.max(state.ema_oscillation),
        "oscillation/total_frozen": jnp.sum(state.frozen),
        "oscillation/iters": state.iters,
    }
