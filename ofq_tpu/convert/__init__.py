"""Checkpoint conversion to/from reference (torch) formats."""

from .torch_export import (
    export_deit,
    export_experiment_torch,
    export_state_dict,
    export_swin,
    save_pth_tar,
)
from .torch_import import (
    convert_bn_stats,
    convert_deit,
    convert_swin,
    load_torch_state_dict,
    merge_pretrained,
    split_qkv_for_qkr,
)

__all__ = [
    "convert_bn_stats", "convert_deit", "convert_swin", "load_torch_state_dict",
    "merge_pretrained", "split_qkv_for_qkr",
    "export_deit", "export_swin", "export_state_dict", "save_pth_tar",
    "export_experiment_torch",
]
