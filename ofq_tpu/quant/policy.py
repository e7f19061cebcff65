"""Quantization policy: config-driven replacement for module surgery.

The reference builds a `qconfigs` dict from CLI flags and mutates a live
torch module tree (reference: train.py:386-426 `get_qat_model`,
src/quantization/modules/utils.py `replace_module_by_qmodule_*`).  In JAX,
quantization is a *constructor-time* decision: models take a `QuantPolicy`
and build quantized or float submodules accordingly.  The policy keeps the
reference's YAML `qmodules` path-string surface so shipped configs translate
1:1 ("blocks.3.attn", "patch_embed.proj", "head", ...).

Pinned special cases preserved from the reference (modules/utils.py:68-101):
  * "patch_embed.proj" / "features.0.0"  -> W8A8 LSQ conv regardless of the
    target bit-width,
  * "head" / "head_dist"                 -> W8A8 LSQ linear head.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Per-site quantizer settings (one of weight or activation)."""

    mode: str = "statsq"  # 'statsq' | 'lsq' | 'identity'
    bit: int = 8
    per_channel: bool = True
    learnable: bool = True
    all_positive: bool = False
    # weights only: --wq_asym selects the unsigned LSQ range
    # (reference train.py:403 "symmetric": not args.wq_asym).
    # INVARIANT: symmetric == not all_positive for weight specs —
    # policy_from_args sets both together; consumers may read either.
    symmetric: bool = True

    @property
    def enabled(self) -> bool:
        return self.mode != "identity" and self.bit < 32


@dataclasses.dataclass(frozen=True)
class QuantPolicy:
    """Model-wide quantization policy.

    `qmodules` lists the module paths to quantize, with the reference's
    path-string convention.  An empty tuple means a float (FP32) model.
    """

    weight: QuantSpec = QuantSpec(mode="statsq", bit=8)
    act: QuantSpec = QuantSpec(mode="lsq", bit=8)
    qmodules: tuple[str, ...] = ()
    qk_reparam: bool = False
    qk_reparam_type: int = 0  # 0: QKR, 1: QKR + CGA in-forward quantizer
    boundary_range: float = 0.005
    act_layer: str = "gelu"
    # --apply_q_attn_dropout (reference train.py:357-358 help text):
    #   0: quantize post-softmax attn AND apply attn dropout
    #   1: don't quantize attn, apply dropout
    #   2: don't quantize attn, no dropout
    #   3: quantize attn, no dropout
    # (the reference parses this into every qconfig at train.py:417 but
    # never consumes it downstream; here it actually takes effect)
    q_attn_mode: int = 0
    # Deployment mode (ofq_tpu/deploy.py): kernels in the param tree are
    # ALREADY the dequantized StatsQ values restored from a packed-integer
    # artifact, so weight fake-quant must be skipped (StatsQ recomputes its
    # scale from live weights and is NOT idempotent); QKR consumes a stored
    # `w_qk_frozen` instead of rebuilding the product from q/k kernels.
    # Activation quantizers and LSQ-weight layers (idempotent) run as usual.
    weight_frozen: bool = False
    # Integer-core serving (ofq_tpu.serve --int-core): with weight_frozen,
    # carry the artifact's ORIGINAL StatsQ scales in the param tree
    # (kernel_scale / w_qk_scale, written by deploy.restore_packed) and
    # reconstruct the integer codes exactly (W_int = round(w_q*2n/s)), so
    # the serving matmuls run int8 x int8 -> int32 on the MXU with EXACT
    # accumulation (ops/int8_qlinear.py).  None -> fp frozen serving.
    frozen_int_bits: int | None = None

    @property
    def quantize_softmax(self) -> bool:
        return self.q_attn_mode in (0, 3)

    @property
    def attn_dropout_enabled(self) -> bool:
        return self.q_attn_mode in (0, 1)

    def quantizes(self, path: str) -> bool:
        return path in self.qmodules

    @property
    def is_float(self) -> bool:
        return not self.qmodules

    @property
    def lsq_weights(self) -> bool:
        """Both weight and act in 'lsq' mode selects the full-LSQ path
        (reference modules/utils.py:65)."""
        return self.weight.mode == "lsq" and self.act.mode == "lsq"


def default_deit_qmodules(depth: int = 12, distilled: bool = True) -> tuple[str, ...]:
    """The qmodules list shipped in configs/ours_imagenet_recipe.attn_q.yml."""
    mods = ["patch_embed.proj"]
    for i in range(depth):
        mods += [f"blocks.{i}.attn", f"blocks.{i}.mlp"]
    mods.append("head")
    if distilled:
        mods.append("head_dist")
    return tuple(mods)


def default_swin_qmodules(depths: Sequence[int] = (2, 2, 6, 2)) -> tuple[str, ...]:
    """The qmodules list for Swin-T (configs/ours_swin_imagenet_recipe.yml):
    patch-embed conv, every block's attn + mlp, patch-merging reductions,
    and the head, using torchvision feature-index paths."""
    mods = ["features.0.0"]
    feat_idx = 1
    for stage, depth in enumerate(depths):
        for block in range(depth):
            mods += [
                f"features.{feat_idx}.{block}.attn",
                f"features.{feat_idx}.{block}.mlp",
            ]
        feat_idx += 1
        if stage < len(depths) - 1:
            mods.append(f"features.{feat_idx}.reduction")
            feat_idx += 1
    mods.append("head")
    return tuple(mods)


def policy_from_args(
    *,
    wq_enable: bool = True,
    wq_mode: str = "statsq",
    wq_bitw: int = 8,
    wq_per_channel: bool = True,
    wq_learnable: bool = False,
    wq_asym: bool = False,
    aq_enable: bool = True,
    aq_mode: str = "lsq",
    aq_bitw: int = 8,
    aq_per_channel: bool = True,
    aq_learnable: bool = True,
    qmodules: Sequence[str] = (),
    qk_reparam: bool = False,
    qk_reparam_type: int = 0,
    boundary_range: float = 0.005,
    act_layer: str = "gelu",
    apply_q_attn_dropout: int = 0,
) -> QuantPolicy:
    """Build a QuantPolicy from reference-style CLI flags.

    Reproduces the reference quirk (train.py:402) where weight bits fall back
    to identity unless `wq_bitw < 32 AND aq_enable` — harmless under shipped
    recipes but preserved for flag-level parity.
    """
    w_mode = wq_mode if wq_enable else "identity"
    w_bits_valid = wq_bitw < 32 and aq_enable
    if wq_asym and w_mode == "statsq" and w_bits_valid:
        raise ValueError(
            "--wq_asym requires --wq-mode lsq: StatsQ's scale (2*mean|W| "
            "per row, statsq.py:122-150) defines a symmetric mid-rise grid "
            "with no asymmetric form; the reference parses the flag but "
            "never consumes it (train.py:403), so rather than a silent "
            "no-op this errors out.")
    weight = QuantSpec(
        mode=w_mode if w_bits_valid else "identity",
        bit=wq_bitw if w_bits_valid else 32,
        per_channel=wq_per_channel,
        learnable=wq_learnable,
        all_positive=wq_asym,
        symmetric=not wq_asym,
    )
    a_bits_valid = aq_enable and aq_bitw < 32
    act = QuantSpec(
        mode=aq_mode if a_bits_valid else "identity",
        # models gate on `bit`; identity mode must carry bit=32 so
        # disabling --aq-enable actually disables activation quantizers
        bit=aq_bitw if a_bits_valid else 32,
        per_channel=aq_per_channel,
        learnable=aq_learnable,
    )
    return QuantPolicy(
        weight=weight,
        act=act,
        qmodules=tuple(qmodules),
        qk_reparam=qk_reparam,
        qk_reparam_type=qk_reparam_type,
        boundary_range=boundary_range,
        act_layer=act_layer,
        q_attn_mode=int(apply_q_attn_dropout),
    )
