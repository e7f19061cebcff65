"""Model zoo: DeiT/ViT and Swin, float + quantized."""

from .deit import (
    DEIT_BASE,
    DEIT_SMALL,
    DEIT_TINY,
    Block,
    DeiTConfig,
    VisionTransformer,
    deit_model,
)
from .registry import create_model, list_models, register_model

__all__ = [
    "DEIT_BASE", "DEIT_SMALL", "DEIT_TINY", "Block", "DeiTConfig",
    "VisionTransformer", "deit_model",
    "create_model", "list_models", "register_model",
]
