"""LR schedules: cosine with warmup and cooldown, epoch-granular.

Matches the reference's timm `create_scheduler(sched='cosine')` semantics
(reference: train.py:731 and the config keys epochs/warmup_epochs/
cooldown_epochs/warmup_lr/min_lr):

  * t < warmup_epochs:          linear from warmup_lr to base_lr
  * warmup <= t < epochs:       lr_min + 0.5*(base-lr_min)*(1+cos(pi*t/epochs))
                                 (timm's warmup_prefix=False: the cosine
                                 phase consumes t *including* the warmup span)
  * t >= epochs (cooldown):     min_lr

The schedule is a pure function of the epoch index so it can live inside
the jitted step (epoch passed as a traced scalar).
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_with_warmup_cooldown(
    base_lr: float,
    *,
    epochs: int,
    warmup_epochs: int = 0,
    warmup_lr: float = 1e-6,
    min_lr: float = 1e-5,
):
    """Returns lr(epoch) as a jnp-traceable function of a scalar epoch.

    `epoch` may be fractional for per-step interpolation; the reference
    steps per-epoch (timm t_in_epochs=True), so pass integers for parity.
    """

    def lr_fn(epoch):
        t = jnp.asarray(epoch, jnp.float32)
        warm = warmup_lr + (base_lr - warmup_lr) * t / max(warmup_epochs, 1)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (
            1.0 + jnp.cos(jnp.pi * t / epochs)
        )
        lr = jnp.where(t < warmup_epochs, warm, cos)
        lr = jnp.where(t >= epochs, min_lr, lr)
        return lr

    return lr_fn


def constant_lr(value: float):
    def lr_fn(epoch):
        return jnp.asarray(value, jnp.float32)

    return lr_fn
