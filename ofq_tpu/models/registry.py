"""Model registry: name -> constructor (timm-style `create_model` analog).

Reference: the timm registry usage in train.py:502-508 and
src/registry.py's no-op fallback.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register_model(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def create_model(name: str, **kwargs) -> Any:
    """Build a model module by reference-compatible name."""
    if name in _REGISTRY:
        return _REGISTRY[name](**kwargs)
    # lazy default registrations
    from .deit import deit_model
    try:
        return deit_model(name, **kwargs)
    except KeyError:
        pass
    from .swin import swin_model
    return swin_model(name, **kwargs)


def list_models() -> list[str]:
    static = [
        "deit_tiny_distilled_patch16_224",
        "deit_small_distilled_patch16_224",
        "deit_tiny_patch16_224",
        "deit_small_patch16_224",
        "deit_base_distilled_patch16_224",
        "swin_t",
    ]
    return sorted(set(static) | set(_REGISTRY))
