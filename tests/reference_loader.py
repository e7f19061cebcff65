"""Import the ACTUAL reference torch code from /root/reference.

The image ships torch (CPU) but neither timm nor torchvision, which the
reference imports.  This module installs minimal, independently-written
stand-ins for exactly the symbols the reference consumes at runtime
(timm PatchEmbed/DropPath/init helpers, torchvision MLP/Permute/
StochasticDepth/weights plumbing), then puts /root/reference on sys.path so
`src.*` — the reference's own quantizers, modules and models — can be
instantiated and run for differential testing against ofq_tpu.

Nothing here is copied from the reference; these are standard public-API
semantics (timm 0.5.x / torchvision 0.15) reimplemented from their
documented behavior.
"""

from __future__ import annotations

import enum
import math
import sys
import types

REFERENCE = "/root/reference"


def _module(name: str) -> types.ModuleType:
    m = types.ModuleType(name)
    sys.modules[name] = m
    return m


def install() -> None:
    """Idempotently install stubs + sys.path so `import src...` works."""
    if "src" in sys.modules and hasattr(sys.modules["src"], "__path__"):
        return

    import torch
    import torch.nn as nn

    # ------------------------------------------------------------- imp
    # the reference does `import imp` (removed in Python 3.12)
    if "imp" not in sys.modules:
        sys.modules["imp"] = types.ModuleType("imp")

    # The reference hardcodes device="cuda" in lazy LSQ init (lsq.py:57-69)
    # and .cuda() in the CGA quantizer (statsq.py:182); torch in this image
    # is CPU-only, so both are redirected to CPU for the test process.
    _orig_zeros = torch.zeros

    def _zeros_cpu(*args, **kwargs):
        if kwargs.get("device") == "cuda":
            kwargs["device"] = "cpu"
        return _orig_zeros(*args, **kwargs)

    torch.zeros = _zeros_cpu
    torch.Tensor.cuda = lambda self, *a, **k: self

    # ------------------------------------------------------------- timm
    def to_2tuple(x):
        return x if isinstance(x, (tuple, list)) else (x, x)

    class PatchEmbed(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, norm_layer=None, flatten=True):
            super().__init__()
            img_size = to_2tuple(img_size)
            patch_size = to_2tuple(patch_size)
            self.img_size = img_size
            self.patch_size = patch_size
            self.grid_size = (img_size[0] // patch_size[0],
                              img_size[1] // patch_size[1])
            self.num_patches = self.grid_size[0] * self.grid_size[1]
            self.flatten = flatten
            self.proj = nn.Conv2d(in_chans, embed_dim,
                                  kernel_size=patch_size, stride=patch_size)
            self.norm = norm_layer(embed_dim) if norm_layer else nn.Identity()

        def forward(self, x):
            x = self.proj(x)
            if self.flatten:
                x = x.flatten(2).transpose(1, 2)
            return self.norm(x)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            return x * mask / keep

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        return torch.nn.init.trunc_normal_(tensor, mean, std, a, b)

    def lecun_normal_(tensor):
        fan_in = tensor.shape[1]
        if tensor.ndim > 2:
            fan_in *= tensor[0][0].numel()
        std = math.sqrt(1.0 / fan_in) / 0.87962566103423978
        return torch.nn.init.trunc_normal_(
            tensor, std=std, a=-2 * std, b=2 * std)

    def named_apply(fn, module, name="", depth_first=True,
                    include_root=False):
        if not depth_first and include_root:
            fn(module=module, name=name)
        for child_name, child in module.named_children():
            child_full = ".".join((name, child_name)) if name else child_name
            named_apply(fn, child, child_full, depth_first, True)
        if depth_first and include_root:
            fn(module=module, name=name)
        return module

    def _unused(*a, **k):
        raise NotImplementedError("stub: not needed for differential tests")

    timm = _module("timm")
    timm.__path__ = []  # mark as package so `from timm.X import Y` resolves
    timm_loss = _module("timm.loss")

    class SoftTargetCrossEntropy(nn.Module):
        def forward(self, x, target):
            return torch.mean(
                torch.sum(-target * torch.nn.functional.log_softmax(x, -1),
                          dim=-1))

    timm_loss.SoftTargetCrossEntropy = SoftTargetCrossEntropy
    timm.loss = timm_loss
    timm_data = _module("timm.data")
    timm_data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    timm_data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    timm_data.IMAGENET_INCEPTION_MEAN = (0.5, 0.5, 0.5)
    timm_data.IMAGENET_INCEPTION_STD = (0.5, 0.5, 0.5)
    timm_models = _module("timm.models")
    timm_helpers = _module("timm.models.helpers")
    timm_helpers.build_model_with_cfg = _unused
    timm_helpers.named_apply = named_apply
    timm_helpers.adapt_input_conv = _unused
    timm_layers = _module("timm.models.layers")
    timm_layers.PatchEmbed = PatchEmbed
    timm_layers.DropPath = DropPath
    timm_layers.trunc_normal_ = trunc_normal_
    timm_layers.lecun_normal_ = lecun_normal_
    timm_layers.to_2tuple = to_2tuple
    timm_registry = _module("timm.models.registry")
    timm_registry.register_model = lambda fn: fn
    timm.data = timm_data
    timm.models = timm_models
    timm_models.helpers = timm_helpers
    timm_models.layers = timm_layers
    timm_models.registry = timm_registry

    # ----- extra timm/CLI surface so `import cga` / `import train` work
    # (their module level does `from timm.X import names...`); none of
    # these stubs is ever CALLED by the differential tests — they import
    # the reference CLIs only for freeze_outside_boundary_weight_idx and
    # friends.
    for name in ("create_dataset", "create_loader", "resolve_data_config",
                 "Mixup", "FastCollateMixup", "AugMixDataset"):
        setattr(timm_data, name, _unused)
    for name in ("create_model", "safe_model_name", "resume_checkpoint",
                 "load_checkpoint", "convert_splitbn_model",
                 "model_parameters"):
        setattr(timm_models, name, _unused)
    timm_loss.LabelSmoothingCrossEntropy = _unused
    timm_loss.JsdCrossEntropy = _unused
    timm_optim = _module("timm.optim")
    timm_optim.create_optimizer_v2 = _unused
    timm_optim.optimizer_kwargs = _unused
    timm.optim = timm_optim
    timm_sched = _module("timm.scheduler")
    timm_sched.create_scheduler = _unused
    timm_sched_sched = _module("timm.scheduler.scheduler")
    timm_sched_sched.Scheduler = type("Scheduler", (), {})
    timm_sched.scheduler = timm_sched_sched
    timm.scheduler = timm_sched
    timm_utils = _module("timm.utils")
    timm_utils.ApexScaler = _unused
    timm_utils.NativeScaler = _unused
    timm_utils.setup_default_logging = lambda *a, **k: None
    timm.utils = timm_utils

    # ------------------------------------------------------- torchvision
    class MLP(nn.Sequential):
        """torchvision.ops.misc.MLP: [Linear, act, Dropout]* + Linear +
        Dropout — index layout matters (QMLP_swin indexes 0/3)."""

        def __init__(self, in_channels, hidden_channels,
                     norm_layer=None, activation_layer=nn.ReLU,
                     inplace=None, bias=True, dropout=0.0):
            layers = []
            in_dim = in_channels
            params = {} if inplace is None else {"inplace": inplace}
            for hidden in hidden_channels[:-1]:
                layers.append(nn.Linear(in_dim, hidden, bias=bias))
                if norm_layer is not None:
                    layers.append(norm_layer(hidden))
                layers.append(activation_layer(**params))
                layers.append(nn.Dropout(dropout, **params))
                in_dim = hidden
            layers.append(nn.Linear(in_dim, hidden_channels[-1], bias=bias))
            layers.append(nn.Dropout(dropout, **params))
            super().__init__(*layers)

    class Permute(nn.Module):
        def __init__(self, dims):
            super().__init__()
            self.dims = dims

        def forward(self, x):
            return torch.permute(x, self.dims)

    class StochasticDepth(nn.Module):
        def __init__(self, p, mode):
            super().__init__()
            self.p = p
            self.mode = mode

        def forward(self, x):
            if not self.training or self.p == 0.0:
                return x
            keep = 1.0 - self.p
            if self.mode == "row":
                size = [x.shape[0]] + [1] * (x.ndim - 1)
            else:
                size = [1] * x.ndim
            noise = torch.empty(size, dtype=x.dtype,
                                device=x.device).bernoulli_(keep)
            return x * noise / keep

    class ImageClassification:
        def __init__(self, **kwargs):
            pass

    class InterpolationMode(enum.Enum):
        BICUBIC = "bicubic"
        BILINEAR = "bilinear"

    class Weights:
        def __init__(self, url=None, transforms=None, meta=None):
            self.url = url
            self.transforms = transforms
            self.meta = meta or {}

    class WeightsEnum(enum.Enum):
        @classmethod
        def verify(cls, obj):
            return obj

    def _ovewrite_named_param(kwargs, name, value):
        kwargs[name] = value

    tv = _module("torchvision")
    tv.__path__ = []
    tv_ops = _module("torchvision.ops")
    tv_misc = _module("torchvision.ops.misc")
    tv_misc.MLP = MLP
    tv_misc.Permute = Permute
    tv_sd = _module("torchvision.ops.stochastic_depth")
    tv_sd.StochasticDepth = StochasticDepth
    tv_tr = _module("torchvision.transforms")
    tv_presets = _module("torchvision.transforms._presets")
    tv_presets.ImageClassification = ImageClassification
    tv_presets.InterpolationMode = InterpolationMode
    tv_utils = _module("torchvision.utils")
    tv_utils._log_api_usage_once = lambda *a, **k: None
    tv_models = _module("torchvision.models")
    tv_api = _module("torchvision.models._api")
    tv_api.WeightsEnum = WeightsEnum
    tv_api.Weights = Weights
    tv_meta = _module("torchvision.models._meta")
    tv_meta._IMAGENET_CATEGORIES = [f"class_{i}" for i in range(1000)]
    tv_mutils = _module("torchvision.models._utils")
    tv_mutils._ovewrite_named_param = _ovewrite_named_param
    tv.ops = tv_ops
    tv_ops.misc = tv_misc
    tv_ops.stochastic_depth = tv_sd
    tv.transforms = tv_tr
    tv_tr._presets = tv_presets
    tv.utils = tv_utils
    tv.models = tv_models
    tv_models._api = tv_api
    tv_models._meta = tv_meta
    tv_models._utils = tv_mutils

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


def build_reference_deit(*, depth=12, embed_dim=192, num_heads=3,
                         num_classes=1000, img_size=224, patch_size=16):
    """Instantiate the reference's DistilledVisionTransformer directly."""
    install()
    from functools import partial

    import torch.nn as nn

    from src.deit import DistilledVisionTransformer

    return DistilledVisionTransformer(
        img_size=img_size, patch_size=patch_size, embed_dim=embed_dim,
        depth=depth, num_heads=num_heads, mlp_ratio=4, qkv_bias=True,
        num_classes=num_classes,
        norm_layer=partial(nn.LayerNorm, eps=1e-6), act_layer=nn.GELU)


def build_reference_swin(*, num_classes=1000, drop_path=0.0):
    install()
    from src.swin import swin_t

    return swin_t(drop_path=drop_path, pretrained=False,
                  num_classes=num_classes)


def quantize_reference(model, *, model_type="deit", wq_bitw=2, aq_bitw=2,
                       qmodules=None, qk_reparam=False, qk_reparam_type=0,
                       wq_mode="statsq", aq_mode="lsq"):
    """Run the reference's own module surgery (get_qat_model semantics,
    reference train.py:386-426) on a torch model."""
    install()
    import torch.nn as nn

    from src.quantization import (
        replace_module_by_qmodule_deit,
        replace_module_by_qmodule_swin,
    )

    if qmodules is None:
        from ofq_tpu.quant import default_deit_qmodules, default_swin_qmodules

        qmodules = (default_swin_qmodules() if model_type == "swin"
                    else default_deit_qmodules(
                        len(model.blocks), distilled=True))
    qconfigs = {}
    for m in qmodules:
        qconfigs[m] = {
            "weight": {"mode": wq_mode, "bit": wq_bitw,
                       "all_positive": False, "symmetric": True,
                       "per_channel": True, "normalize_first": False,
                       "learnable": False},
            "act": {"enable": True, "mode": aq_mode, "bit": aq_bitw,
                    "all_positive": False, "per_channel": True,
                    "normalize_first": False, "learnable": True},
            "q_attn_dropout": 0,
            "act_layer": nn.GELU,
        }
    replace = (replace_module_by_qmodule_swin if model_type == "swin"
               else replace_module_by_qmodule_deit)
    return replace(model, qconfigs, pretrained_initialized=True,
                   qk_reparam=qk_reparam, qk_reparam_type=qk_reparam_type)


def reference_cga():
    """Import the reference's cga.py as a module (its module level only
    builds argparse parsers).  Gives tests the GENUINE
    freeze_outside_boundary_weight_idx (cga.py:450-469) for trajectory
    differentials instead of a transcription."""
    install()
    import cga

    return cga


def setup_alpha(model, x):
    """One eval-mode no-grad forward to materialize every lazy LSQ scale
    (reference train.py:997-1010)."""
    import torch

    model.eval()
    with torch.no_grad():
        model(x)
    return model
