"""Training stack: losses, schedules, optimizers, CGA, train/eval steps."""

from .losses import (
    dampening_loss,
    direction_matching,
    hard_ce,
    kd_soft_and_hard,
    kd_soft_hard_qk,
    kl_token_mse,
    soft_ce,
)
from .schedule import constant_lr, cosine_with_warmup_cooldown
from .optim import adaptive_grad_clip, ema_update, make_optimizer, wd_mask
from .cga import freeze_masks, is_cga_kernel, mask_grads, restore_frozen
from .state import TrainState
from .loop import make_eval_step, make_train_step

__all__ = [
    "dampening_loss", "direction_matching", "hard_ce", "kd_soft_and_hard",
    "kd_soft_hard_qk", "kl_token_mse", "soft_ce",
    "constant_lr", "cosine_with_warmup_cooldown",
    "adaptive_grad_clip", "ema_update", "make_optimizer", "wd_mask",
    "freeze_masks", "is_cga_kernel", "mask_grads", "restore_frozen",
    "TrainState", "make_eval_step", "make_train_step",
]
