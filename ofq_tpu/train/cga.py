"""CGA: confidence-guided annealing as an in-graph optimizer wrapper.

The reference implements CGA as a Python loop over named torch modules in
the train step (reference: cga.py:940-1013): it zeroes the gradients of
weights OUTSIDE the rounding-decision band, lets AdamW step, then restores
the frozen weights' values (undoing weight-decay drift).  Here the same
three phases run inside the jitted step with no host sync:

  1. freeze masks from the *pre-update* weights (`outer_freeze_mask`),
  2. `grad * (1 - mask)` on the selected kernels,
  3. after `optax` applies updates, `w = mask * w_old + (1-mask) * w_new`.

Semantics preserved exactly, including the subtle ones:
  * AdamW moments still update for frozen weights (with zero grad the
    moments decay) — the reference's optimizer.step() does the same,
  * freeze masks are recomputed every step from live weights,
  * module selection by path suffix: fc1/fc2/proj + (.v | qkv) and Swin's
    patch-merging `reduction`, restricted to transformer blocks
    (cga.py:956-977).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..quant.statsq import outer_freeze_mask

# Param-tree leaf selection. Our trees use flax names:
#   blocks_i/attn/{qkv,proj,v_kernel}/kernel, blocks_i/mlp/{fc1,fc2}/kernel
#   (QKR attention stores v as a bare 'v_kernel' param).
_CGA_PARENTS = ("fc1", "fc2", "qkv", "proj", "reduction")


def is_cga_kernel(path, *, qk_reparam: bool, model_type: str = "deit") -> bool:
    """Mirror of the reference's name-suffix match (cga.py:956-977).

    Non-reparam runs freeze fc1/fc2/qkv/proj; QKR runs freeze fc1/fc2/
    v/proj (the fused qkv no longer exists); Swin adds `reduction` and
    drops the 'blocks' containment check.
    """
    names = [getattr(p, "key", str(p)) for p in path]
    leaf = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""
    in_blocks = any(n.startswith("blocks_") for n in names)
    if model_type != "swin" and not in_blocks:
        return False
    if leaf == "v_kernel" and qk_reparam:
        return True
    if leaf != "kernel":
        return False
    if qk_reparam:
        allowed = ("fc1", "fc2", "proj") + (("reduction",) if model_type == "swin" else ())
        return parent in allowed
    return parent in ("fc1", "fc2", "qkv", "proj")


def freeze_masks(params, *, bits: int, boundary_range: float,
                 qk_reparam: bool, model_type: str = "deit"):
    """Per-leaf freeze masks (1.0 = frozen) for CGA-selected kernels,
    None elsewhere."""

    def leaf_mask(path, w):
        if is_cga_kernel(path, qk_reparam=qk_reparam, model_type=model_type):
            return outer_freeze_mask(w, bits, boundary_range)
        return None

    return jax.tree_util.tree_map_with_path(leaf_mask, params)


def mask_grads(grads, masks):
    """grad * (1 - freeze) on selected leaves (cga.py:960-962).

    Masks are exact fp32 0/1 (outer_freeze_mask), so the select is
    expressed as `where` — identical values, and the grad dtype is
    preserved under bf16 masters instead of silently widening."""

    def apply(m, g):
        if m is None:
            return g
        return jnp.where(m > 0.5, jnp.zeros((), g.dtype), g)

    # masks first: its None leaves mark unselected params.
    return jax.tree.map(apply, masks, grads,
                        is_leaf=lambda x: x is None)


def restore_frozen(old_params, new_params, masks):
    """w = freeze*w_old + (1-freeze)*w_new after the optimizer step
    (cga.py:989-1013); exact-binary masks, so `where` == the blend and
    the param dtype is preserved."""

    def apply(m, old, new):
        return new if m is None else jnp.where(m > 0.5, old, new)

    return jax.tree.map(apply, masks, old_params, new_params,
                        is_leaf=lambda x: x is None)
