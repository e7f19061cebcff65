"""Functional quantization core (STE, StatsQ, LSQ, CGA masks, oscillation)."""

from .ste import (at_least_f32, clip_lower, grad_scale, passthrough,
                  round_pass)
from .statsq import (
    cga_band_mask,
    outer_freeze_mask,
    statsq_quantize,
    statsq_quantize_cga,
    statsq_scale,
)
from .lsq import grad_scale_factor, init_scale, lsq_quantize, thresholds
from .policy import (
    QuantPolicy,
    QuantSpec,
    default_deit_qmodules,
    default_swin_qmodules,
    policy_from_args,
)
from .oscillation import (
    OscillationState,
    init_oscillation_state,
    oscillation_metrics,
    track_oscillation,
)

__all__ = [
    "at_least_f32", "clip_lower", "grad_scale", "passthrough", "round_pass",
    "cga_band_mask", "outer_freeze_mask", "statsq_quantize",
    "statsq_quantize_cga", "statsq_scale",
    "grad_scale_factor", "init_scale", "lsq_quantize", "thresholds",
    "QuantPolicy", "QuantSpec", "default_deit_qmodules",
    "default_swin_qmodules", "policy_from_args",
    "OscillationState", "init_oscillation_state", "oscillation_metrics",
    "track_oscillation",
]
