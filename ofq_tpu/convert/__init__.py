"""Checkpoint conversion from reference (torch) formats."""

from .torch_import import (
    convert_deit,
    convert_swin,
    load_torch_state_dict,
    merge_pretrained,
    split_qkv_for_qkr,
)

__all__ = [
    "convert_deit", "convert_swin", "load_torch_state_dict",
    "merge_pretrained", "split_qkv_for_qkr",
]
