"""Swin Transformer (Swin-T) family, float and quantized, in Flax.

TPU-native rebuild of the reference's forked torchvision Swin
(reference: src/swin.py) and its quantized attention/MLP modules
(reference: src/quantization/modules/swin_attention_and_mlp.py).

Behavioral contracts preserved:
  * forward returns `(logits, attn_infos)`; blocks thread (x, attn) tuples
    (swin.py:309-322, 441-448),
  * window partition / cyclic shift / padding geometry and the shifted-
    window attention mask (swin.py:94-159) — here the mask and relative-
    position index are *static* numpy computations done once at trace time
    (shapes are static under jit), so no in-graph masked_fill loops,
  * quantized attention: QLinear qkv/proj, per-token LSQ on q/k, per-channel
    LSQ on v, all-positive LSQ after softmax, with the relative-position
    bias added BEFORE the shift mask (swin_attention_and_mlp.py:201-221),
  * QKR variants quantize the per-head W_qk product inside each window
    batch (swin_attention_and_mlp.py:253-671),
  * PatchMerging: pad-odd + 4-neighbor concat + LN + bias-free reduction
    linear, quantized via the 'features.N.reduction' policy path
    (swin.py:26-59, modules path strings in configs/swin_t_imagenet yml),
  * Swin-T geometry: patch 4, dim 96, depths [2,2,6,2], heads [3,6,12,24],
    window 7 (swin.py:534-544).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..nn.attention import Attention  # noqa: F401 (float path below is custom)
from ..nn.attention import qkr_quant_chain
from ..nn.bias import LearnableBias
from ..nn.conv import QPatchEmbedConv
from ..nn.linear import Mlp, QHeadLinear, QLinear, QMlp
from ..quant.ste import at_least_f32
from ..nn.quantizers import LsqAct
from ..quant.policy import QuantPolicy
from ..quant.statsq import statsq_quantize
from .deit import _drop_path


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    img_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    qqkkvv: bool = False
    ln_eps: float = 1e-5
    # 'batchnorm' swaps every LayerNorm for feature-axis BatchNorm with
    # (batch, H, W) statistics — the Swin analog of the reference's
    # --replace-ln-by-bn (train.py:521-522, src/utils/utils.py
    # replace_ln_by_bn1d).  NB the reference itself CRASHES on Swin: its
    # BatchNorm1d-with-transpose turns (B, H, W, C) into (B, H, C, W) and
    # F.batch_norm reads dim 1 (=H) as channels ("running_mean should
    # contain 56 elements not 96") — so this is the flag's evident intent
    # implemented natively, not a behavior the reference ever delivered.
    # Running stats live in 'batch_stats'; under SPMD the batch reduction
    # is global (GSPMD subsumes sync-bn/distribute_bn, train.py:556-566).
    norm_layer: str = "layernorm"
    matmul_impl: Optional[str] = None
    compute_dtype: Optional[str] = None
    # jax.checkpoint the blocks of these stages (0-indexed).  Measured on
    # the v5e chip (Swin-T W2A2 bf16, B64): remat LOSES throughput —
    # stages (0,1) 436 img/s, (0,) 459, vs 498 plain — because nothing
    # spills at this scale, so the recompute FLOPs buy no saved traffic.
    # Keep it a memory-capacity knob for bigger models/batches, not a
    # speed path (values/grads are bit-exact either way, see
    # tests/test_swin.py::test_remat_stages_matches_plain).
    remat_stages: Tuple[int, ...] = ()
    # 'remat' wraps ONLY the window-attention tail (scores -> bias/mask ->
    # softmax -> LSQ -> @v) in jax.checkpoint: its (Bn, H, 49, 49)
    # intermediates (the padded-probability residuals DESIGN §5e measured
    # at ~300 MB/stage-0 block) are recomputed in backward for ~3.8 GFLOP
    # instead of stored — a different tradeoff from remat_stages, which
    # recomputes entire blocks.  'fused' is not supported for Swin
    # (measured exclusion, DESIGN §5e).
    attn_impl: Optional[str] = None


SWIN_TINY = SwinConfig()


# ---------------------------------------------------------------- geometry
def _rel_pos_index(wh: int, ww: int) -> np.ndarray:
    """Static relative-position index table (swin.py:211-222)."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1).reshape(-1)  # (wh*ww*wh*ww,)


def _shift_attn_mask(pad_h: int, pad_w: int, window: int,
                     shift: int) -> np.ndarray:
    """Static additive mask for shifted windows: (nW, ws*ws, ws*ws) with 0 /
    -100 entries (swin.py:125-141)."""
    img = np.zeros((pad_h, pad_w), np.float32)
    h_slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    w_slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for hs in h_slices:
        for ws in w_slices:
            img[hs, ws] = cnt
            cnt += 1
    img = img.reshape(pad_h // window, window, pad_w // window, window)
    img = img.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = img[:, None, :] - img[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jax.Array, window: int):
    """(B, H, W, C) -> (B*nW, ws*ws, C); H, W already padded."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // window, window, W // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B * (H // window) * (W // window), window * window, C)


def window_reverse(x: jax.Array, window: int, B: int, H: int, W: int):
    C = x.shape[-1]
    x = x.reshape(B, H // window, W // window, window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def _pad_shift(x: jax.Array, window: int, shift: int):
    B, H, W, C = x.shape
    pad_r = (window - W % window) % window
    pad_b = (window - H % window) % window
    x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    pad_h, pad_w = H + pad_b, W + pad_r
    if window >= pad_h or window >= pad_w:
        shift = 0
    if shift > 0:
        x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
    return x, pad_h, pad_w, shift


def _unshift_unpad(x: jax.Array, H: int, W: int, shift: int):
    if shift > 0:
        x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
    return x[:, :H, :W, :]


# ------------------------------------------------------------- attention
class WindowAttentionBase(nn.Module):
    """Shared geometry wrapper; subclasses provide the token-level core."""

    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    qqkkvv: bool = False

    def rel_pos_bias(self):
        w = self.window_size
        n = w * w
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * w - 1) * (2 * w - 1), self.num_heads))
        idx = _rel_pos_index(w, w)
        bias = table[idx].reshape(n, n, self.num_heads)
        return bias.transpose(2, 0, 1)[None]  # (1, nH, n, n); callers cast

    def geometry(self, x):
        B, H, W, _ = x.shape
        xs, pad_h, pad_w, shift = _pad_shift(x, self.window_size, self.shift_size)
        tokens = window_partition(xs, self.window_size)
        mask = None
        if shift > 0:
            mask = jnp.asarray(
                _shift_attn_mask(pad_h, pad_w, self.window_size, shift))
        return tokens, (B, H, W, pad_h, pad_w, shift), mask

    def finish(self, out_tokens, geom):
        B, H, W, pad_h, pad_w, shift = geom
        x = window_reverse(out_tokens, self.window_size, B, pad_h, pad_w)
        return _unshift_unpad(x, H, W, shift)

    def apply_mask(self, attn, mask, num_windows):
        if mask is None:
            return attn
        BnW, nH, n, _ = attn.shape
        attn = attn.reshape(BnW // num_windows, num_windows, nH, n, n)
        attn = attn + mask[None, :, None].astype(attn.dtype)
        return attn.reshape(BnW, nH, n, n)


def _remat_swin_tail(lhs, rhs, v, scale_param, rel_bias, mask, num_windows,
                     *, bits, sm_scale, quantize_softmax, aq_learnable,
                     einsum_spec):
    """Window-attention tail under jax.checkpoint (SwinConfig.attn_impl
    'remat'): scores -> rel-pos bias -> shift mask -> softmax -> LSQ ->
    @v, with the (Bn, H, n, n) intermediates rematerialized in backward
    instead of stored.  The softmax-LSQ scale is pre-processed OUTSIDE
    the checkpoint exactly like nn/attention._remat_attention_tail (eps
    clip with identity grad + grad-scale factor), so gradients match the
    composed LsqAct path."""
    from ..quant.lsq import grad_scale_factor
    from ..quant.ste import clip_lower, grad_scale

    Bn, N, H, _ = rhs.shape
    if quantize_softmax:
        gf = grad_scale_factor((Bn, H, N, N), bits, True, -2)
        s = grad_scale(clip_lower(scale_param, 1e-5), gf)
        if not aq_learnable:
            s = jax.lax.stop_gradient(s)
    else:
        s = None

    @jax.checkpoint
    def tail(lhs, rhs, v, s, rel_bias, mask):
        attn = jnp.einsum(einsum_spec, lhs, rhs) * sm_scale
        attn = attn + rel_bias.astype(attn.dtype)
        if mask is not None:
            BnW, nH, n, _ = attn.shape
            attn = attn.reshape(BnW // num_windows, num_windows, nH, n, n)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(BnW, nH, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        if quantize_softmax:
            thd = 2 ** bits - 1
            sb = s[None, None, :, None].astype(attn.dtype)
            u = jnp.clip(attn / sb, 0, thd)
            attn = (u + jax.lax.stop_gradient(jnp.round(u) - u)) * sb
        return jnp.einsum("bhnm,bmhd->bnhd", attn, v)

    return tail(lhs, rhs, v, s, rel_bias, mask)


class SwinAttention(WindowAttentionBase):
    """Float shifted-window attention (swin.py:62-170)."""

    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        tokens, geom, mask = self.geometry(x)
        Bn, n, C = tokens.shape
        H = self.num_heads
        d = C // H
        # natural (Bn, n, H, d) layout — no materialized head transposes;
        # last-axis split of the contiguous q/k/v thirds is layout-free
        # (the 5-D middle-axis slice cost ~4.7 ms/step of copies on the
        # Swin-T teacher, round-3 trace)
        qkv = nn.Dense(3 * C, name="qkv")(tokens)
        q, k, v = (t.reshape(Bn, n, H, d)
                   for t in jnp.split(qkv, 3, axis=-1))
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (d ** -0.5)
        attn = attn + self.rel_pos_bias().astype(attn.dtype)
        num_windows = (geom[3] // self.window_size) * (geom[4] // self.window_size)
        attn = self.apply_mask(attn, mask, num_windows)
        attn = jax.nn.softmax(attn, axis=-1)
        attn_info = None
        if self.qqkkvv:
            sq = 1.0 / jnp.sqrt(d)
            attn_info = (
                attn,
                jnp.einsum("bnhd,bmhd->bhnm", q, q) * sq,
                jnp.einsum("bnhd,bmhd->bhnm", k, k) * sq,
                jnp.einsum("bnhd,bmhd->bhnm", v, v) * sq,
            )
        attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(Bn, n, C)
        out = nn.Dense(C, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        return self.finish(out, geom), attn_info


class QSwinAttention(WindowAttentionBase):
    """Quantized shifted-window attention
    (swin_attention_and_mlp.py:65-251, `QAttention_swin`)."""

    weight_bits: int = 8
    input_bits: int = 8
    aq_learnable: bool = True
    wq_learnable: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    quantize_softmax: bool = True
    matmul_impl: Optional[str] = None
    attn_impl: Optional[str] = None  # 'remat' -> checkpointed tail
    compute_dtype: Optional[str] = None
    # serve --int-core: passthrough to the qkv/proj QLinears (the frozen
    # kernels + stored kernel_scale params run on the int8 MXU path)
    frozen_int_bits: Optional[int] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        tokens, geom, mask = self.geometry(x)
        Bn, n, C = tokens.shape
        H = self.num_heads
        d = C // H
        lin_kwargs = dict(weight_bits=self.weight_bits,
                          input_bits=self.input_bits, symmetric=True,
                          aq_learnable=self.aq_learnable,
                          matmul_impl=self.matmul_impl,
                          compute_dtype=self.compute_dtype,
                          frozen_int_bits=self.frozen_int_bits)
        # natural (Bn, n, H, d) layout throughout — the head axis rides in
        # place and the einsums carry it; no materialized (Bn, H, n, d)
        # transposes (the round-2/3 DeiT layout treatment, ported: each
        # removed transpose is a full copy of the window-token tensor).
        # Per-token LSQ scale on axis 1 is numerically identical to the
        # reference's axis -2 on (Bn, H, n, d) (same (n,) scale, same
        # group numel Bn*H*d).
        qkv = QLinear(3 * C, name="qkv", **lin_kwargs)(tokens)
        if self.input_bits < 32:
            qkv = LearnableBias(3 * C, name="move_qkv_b4")(qkv)
        # last-axis split of contiguous q/k/v thirds — layout-free
        qs, ks, v = jnp.split(qkv, 3, axis=-1)  # (Bn, n, C) each
        q = qs.reshape(Bn, n, H, d)
        k = ks.reshape(Bn, n, H, d)
        q = LsqAct(self.input_bits, channel_axis=1,
                   learnable=self.aq_learnable, name="quan_q")(q)
        k = LsqAct(self.input_bits, channel_axis=1,
                   learnable=self.aq_learnable, name="quan_k")(k)
        v = LsqAct(self.input_bits, channel_axis=-1,
                   learnable=self.aq_learnable, name="quan_v")(v)
        if self.input_bits < 32:
            q = LearnableBias(C, apply_shape=(H, d), name="move_q_aft")(q)
            k = LearnableBias(C, apply_shape=(H, d), name="move_k_aft")(k)
            v = LearnableBias(C, name="move_v_aft")(v)
        v = v.reshape(Bn, n, H, d)

        num_windows = (geom[3] // self.window_size) * (geom[4] // self.window_size)
        remat_ok = (self.attn_impl == "remat" and self.input_bits < 32
                    and (self.attn_drop == 0.0 or deterministic)
                    and not self.is_initializing())
        if remat_ok:
            from ..nn.attention import _SoftmaxScaleParam

            sp = (_SoftmaxScaleParam(n, name="quan_softmax")()
                  if self.quantize_softmax else None)
            out = _remat_swin_tail(
                q, k, v, sp, self.rel_pos_bias(), mask, num_windows,
                bits=self.input_bits, sm_scale=d ** -0.5,
                quantize_softmax=self.quantize_softmax,
                aq_learnable=self.aq_learnable,
                einsum_spec="bnhd,bmhd->bhnm").reshape(Bn, n, C)
        else:
            attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (d ** -0.5)
            attn = attn + self.rel_pos_bias().astype(attn.dtype)
            attn = self.apply_mask(attn, mask, num_windows)
            attn = jax.nn.softmax(attn, axis=-1)
            if self.quantize_softmax:
                attn = LsqAct(self.input_bits, all_positive=True,
                              channel_axis=-2, learnable=self.aq_learnable,
                              name="quan_softmax")(attn)
            attn = nn.Dropout(self.attn_drop,
                              deterministic=deterministic)(attn)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(Bn, n, C)
        out = QLinear(C, name="proj", **lin_kwargs)(out)
        out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        return self.finish(out, geom), None


class QSwinAttentionQKR(WindowAttentionBase):
    """QKR inside windowed attention — same algebra as the DeiT QKR, batched
    over windows (swin_attention_and_mlp.py:253-671; the CGA variant is
    numerically identical, its freeze logic lives in the outer optimizer
    transform)."""

    weight_bits: int = 8
    input_bits: int = 8
    aq_learnable: bool = True
    wq_learnable: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    quantize_softmax: bool = True
    matmul_impl: Optional[str] = None
    attn_impl: Optional[str] = None  # 'remat' -> checkpointed tail
    compute_dtype: Optional[str] = None
    # deployment mode (ofq_tpu/deploy.py): stored quantized W_qk product
    frozen_wqk: bool = False
    # serve --int-core (see QAttentionQKR)
    frozen_int_bits: Optional[int] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        tokens, geom, mask = self.geometry(x)
        Bn, n, C = tokens.shape
        H = self.num_heads
        d = C // H

        # shared QKR scaffold — one definition with QAttentionQKR
        # (ofq_tpu/nn/attention.py qkr_quant_chain): input codes, v
        # path, W_qk product, 4-D qkx chain; composed / int8 / frozen
        xq, v, qkx, _, _ = qkr_quant_chain(self, tokens)

        num_windows = (geom[3] // self.window_size) * (geom[4] // self.window_size)
        remat_ok = (self.attn_impl == "remat" and self.input_bits < 32
                    and (self.attn_drop == 0.0 or deterministic)
                    and not self.is_initializing())
        if remat_ok:
            from ..nn.attention import _SoftmaxScaleParam

            sp = (_SoftmaxScaleParam(n, name="quan_softmax")()
                  if self.quantize_softmax else None)
            out = _remat_swin_tail(
                xq, qkx, v, sp, self.rel_pos_bias(), mask, num_windows,
                bits=self.input_bits, sm_scale=d ** -0.5,
                quantize_softmax=self.quantize_softmax,
                aq_learnable=self.aq_learnable,
                einsum_spec="bnc,bmhc->bhnm").reshape(Bn, n, C)
        else:
            attn = jnp.einsum("bnc,bmhc->bhnm", xq, qkx) * (d ** -0.5)
            attn = attn + self.rel_pos_bias().astype(attn.dtype)
            attn = self.apply_mask(attn, mask, num_windows)
            attn = jax.nn.softmax(attn, axis=-1)
            if self.quantize_softmax:
                attn = LsqAct(self.input_bits, all_positive=True,
                              channel_axis=-2, learnable=self.aq_learnable,
                              name="quan_softmax")(attn)
            attn = nn.Dropout(self.attn_drop,
                              deterministic=deterministic)(attn)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(Bn, n, C)
        out = QLinear(
            C, weight_bits=self.weight_bits, input_bits=self.input_bits,
            symmetric=True, aq_learnable=self.aq_learnable,
            matmul_impl=self.matmul_impl, frozen_int_bits=self.frozen_int_bits,
            compute_dtype=self.compute_dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        return self.finish(out, geom), None


# ------------------------------------------------------------- structure
class PatchMerging(nn.Module):
    """4-neighbor downsample + LN + (optionally quantized) reduction linear
    (swin.py:26-59)."""

    dim: int
    policy: QuantPolicy
    qpath: str  # e.g. "features.2.reduction"
    ln_eps: float = 1e-5
    compute_dtype: str | None = None
    matmul_impl: str | None = None
    norm_layer: str = "layernorm"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)  # (B, H/2, W/2, 4C)
        x = _norm(self.ln_eps, "norm", self.compute_dtype,
                  self.norm_layer, deterministic)(x)
        if self.policy.quantizes(self.qpath):
            pol = self.policy
            # The reference feeds the 4-D (B, H/2, W/2, 4C) map straight
            # into the quantized linear: the per-"token" LSQ scale rides
            # axis -2, i.e. one scale per WIDTH column shared across rows
            # (LsqQuantizer 4-D branch, lsq.py:552-560).  Keep the 4-D
            # shape so the scale shape matches reference checkpoints.
            # NB: the reference's QLinear always constructs bias=True
            # (qlinear.py:34), so the quantized reduction GAINS a trainable
            # bias the float module lacks — preserved for checkpoint parity.
            return QLinear(
                2 * self.dim,
                weight_bits=(32 if pol.weight_frozen else pol.weight.bit),
                frozen_int_bits=(pol.frozen_int_bits if pol.weight_frozen
                                 else None),
                input_bits=pol.act.bit, symmetric=True,
                aq_learnable=pol.act.learnable, use_bias=True,
                compute_dtype=self.compute_dtype,
                matmul_impl=self.matmul_impl,
                name="reduction")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)



def _norm(eps: float, name: str, compute_dtype,
          norm_layer: str = "layernorm", deterministic: bool = True):
    """Swin's norms via the ONE norm constructor (deit.make_norm), so the
    bf16 dtype-pinning policy can never diverge between families.
    norm_layer='batchnorm' is the --replace-ln-by-bn swap (see
    SwinConfig.norm_layer for the reference-crash caveat)."""
    from .deit import make_norm

    return make_norm(norm_layer, eps, name, deterministic, compute_dtype)

class SwinBlock(nn.Module):
    cfg: SwinConfig
    policy: QuantPolicy
    dim: int
    num_heads: int
    shift: int
    attn_path: str
    mlp_path: str
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg, pol = self.cfg, self.policy
        h = _norm(cfg.ln_eps, "norm1", cfg.compute_dtype,
                  cfg.norm_layer, deterministic)(x)
        common = dict(dim=self.dim, num_heads=self.num_heads,
                      window_size=cfg.window_size, shift_size=self.shift,
                      attn_drop=cfg.attn_drop_rate, proj_drop=cfg.drop_rate)
        if pol.quantizes(self.attn_path):
            # --apply_q_attn_dropout gating (QuantPolicy.q_attn_mode)
            common["attn_drop"] = (cfg.attn_drop_rate
                                   if pol.attn_dropout_enabled else 0.0)
            wb = 32 if pol.weight_frozen else pol.weight.bit
            fib = pol.frozen_int_bits if pol.weight_frozen else None
            qkw = dict(weight_bits=wb, input_bits=pol.act.bit,
                       aq_learnable=pol.act.learnable,
                       wq_learnable=pol.weight.learnable,
                       quantize_softmax=pol.quantize_softmax,
                       matmul_impl=cfg.matmul_impl,
                       attn_impl=cfg.attn_impl,
                       compute_dtype=cfg.compute_dtype,
                       frozen_int_bits=fib)
            if pol.qk_reparam:
                attn_out, info = QSwinAttentionQKR(
                    name="attn", frozen_wqk=pol.weight_frozen,
                    **qkw, **common)(h, deterministic=deterministic)
            else:
                attn_out, info = QSwinAttention(
                    name="attn", **qkw, **common)(h, deterministic=deterministic)
        else:
            attn_out, info = SwinAttention(
                qqkkvv=cfg.qqkkvv, name="attn", **common
            )(h, deterministic=deterministic)
        if self.drop_path > 0 and not deterministic:
            attn_out = _drop_path(attn_out, self.drop_path, deterministic,
                                  self.make_rng("droppath"))
        x = x + attn_out

        h = _norm(cfg.ln_eps, "norm2", cfg.compute_dtype,
                  cfg.norm_layer, deterministic)(x)
        hidden = int(self.dim * cfg.mlp_ratio)
        # 4-D maps go straight into the (quantized) MLP: the reference's
        # LSQ scale is per width column on (B, H, W, C) inputs
        # (QMLP_swin feeds 4-D, lsq.py:552-560) — do not flatten.
        if pol.quantizes(self.mlp_path):
            mlp_out = QMlp(
                hidden_features=hidden, out_features=self.dim,
                weight_bits=(32 if pol.weight_frozen else pol.weight.bit),
                frozen_int_bits=(pol.frozen_int_bits if pol.weight_frozen
                                 else None),
                input_bits=pol.act.bit,
                aq_learnable=pol.act.learnable,
                wq_learnable=pol.weight.learnable,
                act_layer=pol.act_layer, dropout_rate=cfg.drop_rate,
                matmul_impl=cfg.matmul_impl,
                compute_dtype=cfg.compute_dtype,
                name="mlp")(h, deterministic=deterministic)
        else:
            mlp_out = Mlp(hidden_features=hidden, out_features=self.dim,
                          dropout_rate=cfg.drop_rate,
                          name="mlp")(h, deterministic=deterministic)
        if self.drop_path > 0 and not deterministic:
            mlp_out = _drop_path(mlp_out, self.drop_path, deterministic,
                                 self.make_rng("droppath"))
        return x + mlp_out, info


class SwinTransformer(nn.Module):
    cfg: SwinConfig
    policy: QuantPolicy = QuantPolicy()

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False):
        cfg, pol = self.cfg, self.policy
        deterministic = not train
        P = cfg.patch_size

        # features.0: patch embed conv (+LN). Quantized path pinned W8A8.
        if pol.quantizes("features.0.0"):
            x = QPatchEmbedConv(
                features=cfg.embed_dim, patch_size=(P, P),
                img_size=(cfg.img_size,) * 2, name="patch_embed")(x)
        else:
            x = nn.Conv(cfg.embed_dim, kernel_size=(P, P), strides=(P, P),
                        padding="VALID", name="patch_embed")(x)
        from .deit import make_norm

        x = make_norm(cfg.norm_layer, cfg.ln_eps, "patch_norm",
                      deterministic, None)(x)
        if cfg.compute_dtype is not None:
            x = x.astype(jnp.dtype(cfg.compute_dtype))

        total_blocks = sum(cfg.depths)
        block_id = 0
        feat_idx = 1
        attn_infos = []
        dim = cfg.embed_dim
        for stage, depth in enumerate(cfg.depths):
            for blk in range(depth):
                sd = cfg.drop_path_rate * block_id / max(total_blocks - 1, 1)
                shift = 0 if blk % 2 == 0 else cfg.window_size // 2
                block_cls = (nn.remat(SwinBlock, static_argnums=(2,))
                             if stage in cfg.remat_stages else SwinBlock)
                x, info = block_cls(
                    cfg=cfg, policy=pol, dim=dim,
                    num_heads=cfg.num_heads[stage], shift=shift,
                    attn_path=f"features.{feat_idx}.{blk}.attn",
                    mlp_path=f"features.{feat_idx}.{blk}.mlp",
                    drop_path=sd,
                    name=f"features_{feat_idx}_{blk}",
                )(x, deterministic)
                attn_infos.append(info)
                block_id += 1
            feat_idx += 1
            if stage < len(cfg.depths) - 1:
                x = PatchMerging(
                    dim=dim, policy=pol,
                    qpath=f"features.{feat_idx}.reduction",
                    ln_eps=cfg.ln_eps, compute_dtype=cfg.compute_dtype,
                    matmul_impl=cfg.matmul_impl,
                    norm_layer=cfg.norm_layer,
                    name=f"features_{feat_idx}")(x, deterministic)
                feat_idx += 1
                dim *= 2

        x = _norm(cfg.ln_eps, "norm", cfg.compute_dtype,
                  cfg.norm_layer, deterministic)(x)
        x = jnp.mean(x, axis=(1, 2)).astype(
            at_least_f32(x.dtype))  # global average pool, head >=fp32
        if pol.quantizes("head"):
            logits = QHeadLinear(cfg.num_classes, name="head")(x)
        else:
            logits = nn.Dense(cfg.num_classes, name="head")(x)
        if not cfg.qqkkvv:
            attn_infos = None
        return logits, attn_infos

    @staticmethod
    def no_weight_decay() -> tuple[str, ...]:
        return ("relative_position_bias_table",)


def swin_model(variant: str, policy: QuantPolicy = QuantPolicy(),
               **overrides: Any) -> SwinTransformer:
    base = {
        "swin_t": SWIN_TINY,
        "swin_tiny_patch4_window7_224": SWIN_TINY,
        # 2-stage toy for CLI smokes / CI (not a reference model); same
        # geometry as tests/test_swin.py SMALL so every windowing path
        # (2x2 windows -> merge -> single window) runs in the E2E loop
        "swin_test": dataclasses.replace(
            SWIN_TINY, img_size=32, embed_dim=12, depths=(1, 1),
            num_heads=(2, 4), window_size=4, drop_path_rate=0.0),
    }[variant]
    cfg = dataclasses.replace(base, **overrides) if overrides else base
    return SwinTransformer(cfg=cfg, policy=policy)
