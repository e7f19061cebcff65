"""Quantized and float Flax layers."""

from .bias import ImageBias, LearnableBias
from .quantizers import LsqAct, LsqWeight
from .linear import LsqLinear, Mlp, QHeadLinear, QLinear, QMlp
from .conv import PatchEmbedConv, QPatchEmbedConv
from .attention import Attention, QAttention, QAttentionQKR

__all__ = [
    "ImageBias", "LearnableBias", "LsqAct", "LsqWeight",
    "LsqLinear", "Mlp", "QHeadLinear", "QLinear", "QMlp",
    "PatchEmbedConv", "QPatchEmbedConv",
    "Attention", "QAttention", "QAttentionQKR",
]
