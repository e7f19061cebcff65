"""DeiT / ViT model family, float and quantized, in Flax.

TPU-native rebuild of the reference's forked timm ViT
(reference: src/deit_vision_transformer.py, src/deit.py).  Key behavioral
contracts preserved:

  * every model returns a tuple `(logits, attn_info)`; distilled models in
    training mode return `((cls_logits, dist_logits), attn_info)` and in
    eval mode `((cls + dist) / 2, attn_info)`
    (reference: src/deit.py:56-67, deit_vision_transformer.py:318-330),
  * `qqkkvv=True` threads per-block (attn, q·qᵀ, k·kᵀ, v·vᵀ)/√d Gram
    matrices out for qk-direction distillation
    (deit_vision_transformer.py:105-119),
  * quantization policy: per-path module selection with the pinned W8A8
    patch-embed / head special cases (modules/utils.py:68-101),
  * no-weight-decay set {pos_embed, cls_token, dist_token}
    (deit_vision_transformer.py:272-274) — exported for the optimizer.

Layout is NHWC for images and (B, N, C) tokens.  Blocks run under
`nn.remat` optionally (rematerialization replaces activation memory with
recompute — the TPU answer to the reference's FP32 memory pressure).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.attention import Attention, QAttention, QAttentionQKR
from ..nn.conv import PatchEmbedConv, QPatchEmbedConv
from ..nn.linear import Mlp, QHeadLinear, QMlp
from ..quant.policy import QuantPolicy
from ..quant.ste import at_least_f32


@dataclasses.dataclass(frozen=True)
class DeiTConfig:
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    distilled: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    qqkkvv: bool = False
    ln_eps: float = 1e-6
    remat: bool = False
    # 'batchnorm' swaps every LayerNorm for feature-axis BatchNorm
    # (reference: src/utils/utils.py replace_ln_by_bn behind
    # --replace-ln-by-bn; its BatchNorm1d-with-transpose == BN over the
    # feature axis with (batch, token) statistics).  Running stats live in
    # the 'batch_stats' collection; under SPMD the batch reduction is
    # global, so the reference's distribute_bn/sync-bn machinery
    # (train.py:556-566, 823-826) is subsumed by GSPMD collectives.
    norm_layer: str = "layernorm"
    # matmul backend for quantized linears: None/'xla' | 'pallas' | 'fused'
    matmul_impl: Optional[str] = None
    # attention backend: None/'xla' | 'fused' (Pallas softmax/LSQ/attn@v
    # core; falls back to the composition when dropout/qqkkvv need the
    # materialized probabilities)
    attn_impl: Optional[str] = None
    # return per-block token features for token-KD (KLTokenMSELoss):
    # the aux output becomes {'attn_infos': ..., 'features': [...]}
    return_features: bool = False
    # 'bfloat16' runs the token stream end-to-end in bf16 — matmuls,
    # einsums, residuals, norms, AND the activation fake-quant chains
    # (integer levels are exact in bf16; norm statistics and LSQ scale
    # gradients still accumulate in fp32) with fp32 master params — the
    # TPU-native speed path; None keeps the reference's fp32 everywhere.
    compute_dtype: Optional[str] = None


DEIT_TINY = DeiTConfig(embed_dim=192, num_heads=3)
DEIT_SMALL = DeiTConfig(embed_dim=384, num_heads=6)
DEIT_BASE = DeiTConfig(embed_dim=768, num_heads=12)


class TorchBatchNorm(nn.Module):
    """Feature-axis BatchNorm with exact torch `_BatchNorm` semantics.

    The --replace-ln-by-bn swap must match the reference's
    `BatchNorm(transpose=True)` (src/utils/utils.py) bit-for-bit, and
    flax's nn.BatchNorm differs in two ways that a train-mode
    differential catches:
      * torch updates running_var with the UNBIASED batch variance
        (n/(n-1)); flax uses the biased one,
      * the reference's `build_bn_from_ln` drops the LN's eps and takes
        torch's BatchNorm default 1e-5 (NOT the ViT LN's 1e-6).
    Normalization in train mode uses the biased batch variance (both
    frameworks agree there); running stats live in 'batch_stats' under
    the same {mean, var} names flax uses (checkpoint-shape compatible).
    Param/stat trees stay fp32; statistics compute in >=fp32.
    """

    use_running_average: bool
    epsilon: float = 1e-5
    momentum: float = 0.1  # torch convention: new = (1-m)·old + m·batch
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        stat_dtype = jnp.promote_types(x.dtype, jnp.float32)
        if self.use_running_average:
            mean = ra_mean.value.astype(stat_dtype)
            var = ra_var.value.astype(stat_dtype)
        else:
            xf = x.astype(stat_dtype)
            red = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, red)
            # biased variance normalizes (torch and flax agree) ...
            var = jnp.mean(jnp.square(xf - mean), red)
            if not self.is_initializing():
                n = x.size // C
                # ... the UNBIASED one feeds the running update (torch
                # F.batch_norm training-mode semantics)
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                # stat_dtype (not a hard fp32 cast): >=fp32 always; keeps
                # the fp64 torch-differential path exact under x64
                ra_mean.value = ((1 - m) * ra_mean.value
                                 + m * jax.lax.stop_gradient(
                                     mean.astype(stat_dtype)))
                ra_var.value = ((1 - m) * ra_var.value
                                + m * jax.lax.stop_gradient(
                                    unbiased.astype(stat_dtype)))
        out_dtype = (jnp.dtype(self.dtype) if self.dtype is not None
                     else x.dtype)
        # sqrt+divide, NOT rsqrt: torch's F.batch_norm normalizes with
        # 1/sqrt, and the rsqrt ulp difference is enough to flip STE
        # clip-mask boundaries downstream over a multi-step fp64
        # trajectory (caught by test_bn_swap_6_steps at 2.4e-6)
        y = (x.astype(stat_dtype) - mean) / jnp.sqrt(var + self.epsilon)
        y = y * scale.astype(stat_dtype) + bias.astype(stat_dtype)
        return y.astype(out_dtype)


def make_norm(norm_layer: str, eps: float, name: str, deterministic: bool,
              compute_dtype: Optional[str] = None):
    # dtype must be pinned under the bf16 stream: flax's default dtype
    # inference promotes bf16 inputs with fp32 scale/bias params back to
    # fp32, which would silently undo the compute-dtype policy at every
    # norm (statistics still accumulate in fp32 internally)
    dtype = jnp.dtype(compute_dtype) if compute_dtype is not None else None
    if norm_layer == "batchnorm":
        # NB: eps is NOT the LN eps — the reference's build_bn_from_ln
        # drops it and takes torch's BatchNorm default (see TorchBatchNorm)
        return TorchBatchNorm(use_running_average=deterministic,
                              dtype=dtype, name=name)
    return nn.LayerNorm(epsilon=eps, dtype=dtype, name=name)


def _drop_path(x: jax.Array, rate: float, deterministic: bool,
               rng) -> jax.Array:
    """Stochastic depth on the residual branch (per-sample)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


class Block(nn.Module):
    """Pre-norm transformer block threading (x, attn_info) tuples.

    Reference: deit_vision_transformer.py:132-164.
    """

    cfg: DeiTConfig
    policy: QuantPolicy
    index: int
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        # `deterministic` is positional so nn.remat can pin it static
        # (static_argnums below) — a traced bool crashes flax Dropout's
        # `if deterministic:` under remat with any nonzero dropout rate
        cfg, pol = self.cfg, self.policy
        attn_path = f"blocks.{self.index}.attn"
        mlp_path = f"blocks.{self.index}.mlp"
        C = cfg.embed_dim
        hidden = int(C * cfg.mlp_ratio)

        # deploy mode: kernels already hold dequantized StatsQ values
        wb = 32 if pol.weight_frozen else pol.weight.bit
        fib = pol.frozen_int_bits if pol.weight_frozen else None
        h = make_norm(cfg.norm_layer, cfg.ln_eps, "norm1", deterministic,
                      cfg.compute_dtype)(x)
        if pol.quantizes(attn_path):
            # --apply_q_attn_dropout gates the post-softmax quantizer and
            # the attention dropout (QuantPolicy.q_attn_mode semantics)
            q_attn_drop = (cfg.attn_drop_rate
                           if pol.attn_dropout_enabled else 0.0)
            if pol.qk_reparam:
                attn = QAttentionQKR(
                    num_heads=cfg.num_heads,
                    frozen_wqk=pol.weight_frozen, frozen_int_bits=fib,
                    weight_bits=wb, input_bits=pol.act.bit,
                    aq_learnable=pol.act.learnable,
                    wq_learnable=pol.weight.learnable,
                    attn_drop=q_attn_drop, proj_drop=cfg.drop_rate,
                    qqkkvv=cfg.qqkkvv, compute_dtype=cfg.compute_dtype,
                    quantize_softmax=pol.quantize_softmax,
                    matmul_impl=cfg.matmul_impl, attn_impl=cfg.attn_impl,
                    name="attn")
            else:
                attn = QAttention(
                    num_heads=cfg.num_heads, frozen_int_bits=fib,
                    weight_bits=wb, input_bits=pol.act.bit,
                    aq_learnable=pol.act.learnable,
                    wq_learnable=pol.weight.learnable,
                    attn_drop=q_attn_drop, proj_drop=cfg.drop_rate,
                    qqkkvv=cfg.qqkkvv, lsq_weights=pol.lsq_weights,
                    wq_all_positive=not pol.weight.symmetric,
                    quantize_softmax=pol.quantize_softmax,
                    compute_dtype=cfg.compute_dtype,
                    matmul_impl=cfg.matmul_impl, attn_impl=cfg.attn_impl,
                    name="attn")
        else:
            attn = Attention(
                num_heads=cfg.num_heads, qkv_bias=True,
                attn_drop=cfg.attn_drop_rate, proj_drop=cfg.drop_rate,
                qqkkvv=cfg.qqkkvv, name="attn")
        attn_out, attn_info = attn(h, deterministic=deterministic)
        if self.drop_path > 0 and not deterministic:
            attn_out = _drop_path(
                attn_out, self.drop_path, deterministic,
                self.make_rng("droppath"))
        x = x + attn_out

        h = make_norm(cfg.norm_layer, cfg.ln_eps, "norm2", deterministic,
                      cfg.compute_dtype)(x)
        if pol.quantizes(mlp_path):
            mlp = QMlp(
                hidden_features=hidden, out_features=C,
                frozen_int_bits=fib,
                weight_bits=wb, input_bits=pol.act.bit,
                aq_learnable=pol.act.learnable,
                wq_learnable=pol.weight.learnable,
                act_layer=pol.act_layer, dropout_rate=cfg.drop_rate,
                lsq_weights=pol.lsq_weights,
                wq_all_positive=not pol.weight.symmetric,
                compute_dtype=cfg.compute_dtype,
                matmul_impl=cfg.matmul_impl, name="mlp")
        else:
            mlp = Mlp(hidden_features=hidden, out_features=C,
                      dropout_rate=cfg.drop_rate, name="mlp")
        mlp_out = mlp(h, deterministic=deterministic)
        if self.drop_path > 0 and not deterministic:
            mlp_out = _drop_path(
                mlp_out, self.drop_path, deterministic,
                self.make_rng("droppath"))
        x = x + mlp_out
        return x, attn_info


class VisionTransformer(nn.Module):
    """DeiT/ViT with optional distillation token and quantization policy."""

    cfg: DeiTConfig
    policy: QuantPolicy = QuantPolicy()

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False):
        cfg, pol = self.cfg, self.policy
        deterministic = not train
        C = cfg.embed_dim
        B = x.shape[0]
        num_tokens = 2 if cfg.distilled else 1
        grid = cfg.img_size // cfg.patch_size

        # --- patch embed (pinned W8A8 LSQ conv when quantized) ---
        if pol.quantizes("patch_embed.proj") or pol.quantizes("features.0.0"):
            patches = QPatchEmbedConv(
                features=C, patch_size=(cfg.patch_size,) * 2,
                img_size=(cfg.img_size,) * 2, name="patch_embed")(x)
        else:
            patches = PatchEmbedConv(
                features=C, patch_size=(cfg.patch_size,) * 2,
                name="patch_embed")(x)
        patches = patches.reshape(B, grid * grid, C)

        cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, C))
        tokens = [jnp.broadcast_to(cls_token, (B, 1, C)).astype(patches.dtype)]
        if cfg.distilled:
            dist_token = self.param(
                "dist_token", nn.initializers.truncated_normal(0.02), (1, 1, C))
            tokens.append(
                jnp.broadcast_to(dist_token, (B, 1, C)).astype(patches.dtype))
        x = jnp.concatenate(tokens + [patches], axis=1)

        pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, grid * grid + num_tokens, C))
        x = x + pos_embed.astype(x.dtype)
        x = nn.Dropout(cfg.drop_rate, deterministic=deterministic)(x)
        if cfg.compute_dtype is not None:
            x = x.astype(jnp.dtype(cfg.compute_dtype))

        # --- transformer blocks ---
        attn_infos = []
        features = []
        dpr = [cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
               for i in range(cfg.depth)]
        block_cls = Block
        if cfg.remat:
            # deterministic (arg 2, after self/x) must be STATIC: flax
            # Dropout and the drop-path guard branch on it in Python
            block_cls = nn.remat(Block, static_argnums=(2,))
        for i in range(cfg.depth):
            x, info = block_cls(
                cfg=cfg, policy=pol, index=i, drop_path=dpr[i],
                name=f"blocks_{i}")(x, deterministic)
            attn_infos.append(info)
            features.append(x)

        x = make_norm(cfg.norm_layer, cfg.ln_eps, "norm", deterministic,
                      cfg.compute_dtype)(x)
        # head stays >=fp32 under bf16 masters
        x = x.astype(at_least_f32(x.dtype))

        # --- heads (pinned W8A8 when quantized) ---
        def head_module(path: str, name: str):
            if pol.quantizes(path):
                return QHeadLinear(cfg.num_classes, name=name)
            # reference _init_weights applies trunc_normal_(std=.02) to every
            # nn.Linear including head/head_dist (deit_vision_transformer.py)
            return nn.Dense(
                cfg.num_classes,
                kernel_init=nn.initializers.truncated_normal(0.02),
                name=name)

        if not cfg.qqkkvv:
            attn_infos = None
        aux = attn_infos
        if cfg.return_features:
            aux = {"attn_infos": attn_infos, "features": features}

        if cfg.distilled:
            cls_logits = head_module("head", "head")(x[:, 0])
            dist_logits = head_module("head_dist", "head_dist")(x[:, 1])
            if train:
                return (cls_logits, dist_logits), aux
            return (cls_logits + dist_logits) / 2.0, aux
        cls_logits = head_module("head", "head")(x[:, 0])
        return cls_logits, aux

    @staticmethod
    def no_weight_decay() -> tuple[str, ...]:
        return ("pos_embed", "cls_token", "dist_token")


def deit_model(variant: str, policy: QuantPolicy = QuantPolicy(),
               **overrides: Any) -> VisionTransformer:
    """Constructor by reference model name.

    Accepts timm-style names ('deit_tiny_distilled_patch16_224', ...).
    """
    base = {
        "deit_tiny_distilled_patch16_224": DEIT_TINY,
        "deit_small_distilled_patch16_224": DEIT_SMALL,
        "deit_tiny_patch16_224": dataclasses.replace(DEIT_TINY, distilled=False),
        "deit_small_patch16_224": dataclasses.replace(DEIT_SMALL, distilled=False),
        "deit_base_distilled_patch16_224": DEIT_BASE,
        # 2-block toy for CLI smokes / CI (not a reference model)
        "deit_test_distilled": DeiTConfig(
            img_size=32, patch_size=8, embed_dim=24, depth=2, num_heads=3),
    }[variant]
    cfg = dataclasses.replace(base, **overrides) if overrides else base
    return VisionTransformer(cfg=cfg, policy=policy)
