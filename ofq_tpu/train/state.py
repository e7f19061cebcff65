"""Train state pytree."""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array
    epoch: jax.Array
    ema_params: Optional[Any] = None
    # auxiliary in-graph state (e.g. {'oscillation': {path: OscillationState}})
    extra: Optional[Any] = None

    @classmethod
    def create(cls, params, tx, ema: bool = False, extra: Any = None):
        import jax.numpy as jnp

        # Adam moments live in >=fp32, even under bf16 master weights (the
        # update math runs in fp32; see train/loop.py).  Promote-only so
        # the x64 trajectory-differential tests keep fp64 moments.
        f32_view = jax.tree.map(
            lambda x: x.astype(jnp.promote_types(x.dtype, jnp.float32)),
            params["params"])
        return cls(
            params=params,
            opt_state=tx.init(f32_view),
            step=jnp.zeros((), jnp.int32),
            epoch=jnp.zeros((), jnp.int32),
            # EMA accumulators always live in fp32: under bf16 masters the
            # per-step delta (1-decay)*(p-e) ~ 1e-4*|p| is below the bf16
            # ulp (~4e-3 relative), so a bf16 EMA would never move at all
            ema_params=(jax.tree.map(
                lambda x: x.astype(jnp.float32), params["params"])
                if ema else None),
            extra=extra,
        )
