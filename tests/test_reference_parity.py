"""End-to-end forward parity against an independent numpy transcription of
the reference's quantized DeiT eval forward.

The numpy model below re-derives every operation from the reference's
math (torch layouts: (out,in) linears, NCHW conv) — it shares no code with
ofq_tpu.  Our Flax model, fed the SAME parameters (converted layouts), must
produce the same logits.  This is the no-checkpoint analog of the released-
checkpoint reproduction evals (reference README.md:38-51).
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofq_tpu.models import DeiTConfig, VisionTransformer
from ofq_tpu.quant import default_deit_qmodules, policy_from_args

CFG = DeiTConfig(img_size=32, patch_size=16, embed_dim=24, depth=2,
                 num_heads=3, num_classes=10)
BITS = 2


# ------------------------------------------------------------- numpy ref
def np_lsq(x, s, bit, all_positive, axis):
    lo, hi = (0, 2**bit - 1) if all_positive else (-(2**(bit-1)), 2**(bit-1) - 1)
    s = np.maximum(np.asarray(s, np.float64), 1e-5)
    if axis is not None:
        shape = [1] * x.ndim
        shape[axis] = -1
        s = s.reshape(shape)
    y = np.clip(x / s, lo, hi)
    # banker's rounding to match torch/jnp
    return np.round(y) * s


def np_statsq(w_out_in, bits):
    s = 2 * np.mean(np.abs(w_out_in), axis=1, keepdims=True)
    c = np.clip(w_out_in / s, -1.0, 1.0 - 1e-6)
    n = float(2 ** (bits - 1))
    return s * ((np.round(c * n - 0.5) + 0.5) / n)


def np_layernorm(x, gamma, beta, eps):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * gamma + beta


def np_gelu(x):
    from scipy.special import erf  # scipy ships with the image? fallback below
    return 0.5 * x * (1 + erf(x / np.sqrt(2)))


try:
    import scipy  # noqa: F401
except ImportError:  # erf via math, vectorized
    def np_gelu(x):  # noqa: F811
        v = np.vectorize(lambda t: 0.5 * t * (1 + math.erf(t / math.sqrt(2))))
        return v(x).astype(x.dtype)


def np_qlinear(x, P, bits, all_positive=False):
    """P: dict(weight (out,in), bias, move_b4, s, move_aft)."""
    x = x + P["move_b4"]
    x = np_lsq(x, P["s"], bits, all_positive, axis=-2)
    x = x + P["move_aft"]
    wq = np_statsq(P["weight"], bits)
    return x @ wq.T + P["bias"]


def np_attention(x, P, H, bits):
    B, N, C = x.shape
    d = C // H
    qkv = np_qlinear(x, P["qkv"], bits)                 # (B, N, 3C)
    qkv = qkv + P["move_qkv_b4"]
    qkv = qkv.reshape(B, N, 3, H, d).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]                    # (B, H, N, d)
    q = np_lsq(q, P["s_q"], bits, False, axis=-2)
    k = np_lsq(k, P["s_k"], bits, False, axis=-2)
    v = v.transpose(0, 2, 1, 3).reshape(B, N, C)
    v = np_lsq(v, P["s_v"], bits, False, axis=-1)
    q = q.transpose(0, 2, 1, 3).reshape(B, N, C) + P["move_q_aft"]
    k = k.transpose(0, 2, 1, 3).reshape(B, N, C) + P["move_k_aft"]
    v = v + P["move_v_aft"]
    q = q.reshape(B, N, H, d).transpose(0, 2, 1, 3)
    k = k.reshape(B, N, H, d).transpose(0, 2, 1, 3)
    v = v.reshape(B, N, H, d).transpose(0, 2, 1, 3)
    attn = q @ k.transpose(0, 1, 3, 2) * (d ** -0.5)
    attn = np.exp(attn - attn.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    attn = np_lsq(attn, P["s_softmax"], bits, True, axis=-2)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, C)
    return np_qlinear(out, P["proj"], bits)


def np_attention_qkr(x, P, H, bits):
    """QKR attention exactly as attention.py:174-222."""
    B, N, C = x.shape
    d = C // H
    xq = x + P["x_move_b4"]
    xq = np_lsq(xq, P["s_x"], bits, False, axis=-2)
    xq = xq + P["x_move_aft"]
    # V path
    vq = np_statsq(P["v_weight"], bits)
    v_out = xq @ vq.T + P["v_bias"]
    v_out = v_out + P["move_v_b4"]
    v_out = np_lsq(v_out, P["s_v"], bits, False, axis=-1)
    v_out = v_out + P["move_v_aft"]
    v = v_out.reshape(B, N, H, d).transpose(0, 2, 1, 3)
    # per-head W_qk = Wq^T @ Wk, StatsQ'd as (H*C, C)
    wq_h = P["q_weight"].reshape(H, d, C)
    wk_h = P["k_weight"].reshape(H, d, C)
    w_qk = np.einsum("hdi,hdj->hij", wq_h, wk_h).reshape(H * C, C)
    w_qk = np_statsq(w_qk, bits).reshape(H, C, C)
    qkx = np.einsum("hij,bnj->bhin", w_qk, xq)          # (B, H, C, N)
    qkx = qkx.transpose(0, 3, 1, 2).reshape(B, N, H * C)
    qkx = qkx + P["move_qkx_b4"]
    qkx = qkx.reshape(B, N * H, C)
    qkx = np_lsq(qkx, P["s_qkx"], bits, False, axis=-2)
    qkx = qkx.reshape(B, N, H * C) + P["move_qkx_aft"]
    qkx = qkx.reshape(B, N, H, C).transpose(0, 2, 3, 1)  # (B, H, C, N)
    attn = np.einsum("bnc,bhcm->bhnm", xq, qkx) * (d ** -0.5)
    attn = np.exp(attn - attn.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    attn = np_lsq(attn, P["s_softmax"], bits, True, axis=-2)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, C)
    return np_qlinear(out, P["proj"], bits)


def np_head(x, P):
    """W8A8 head: per-tensor input LSQ, per-row weight LSQ."""
    x = x + P["move_b4"]
    x = np_lsq(x, P["s_in"], 8, False, axis=None)
    x = x + P["move_aft"]
    sw = np.maximum(P["s_w"], 1e-5)[:, None]
    wq = np.clip(P["weight"] / sw, -128, 127)
    wq = np.round(wq) * sw
    return x @ wq.T + P["bias"]


def np_patch_embed(img_nchw, P, patch, img_size):
    """W8A8 patchify conv in torch layout (B, C, H, W)."""
    x = img_nchw + P["move_b4"].reshape(1, 1, img_size, img_size)
    # per-input-channel LSQ, signed
    x = np_lsq(x.transpose(0, 2, 3, 1), P["s_in"], 8, False, axis=-1)
    x = x.transpose(0, 3, 1, 2)
    x = x + P["move_aft"].reshape(1, 1, img_size, img_size)
    # weight (O, I, kh, kw), per-out-channel LSQ signed
    W = P["weight"]
    sw = np.maximum(P["s_w"], 1e-5)[:, None, None, None]
    wq = np.round(np.clip(W / sw, -128, 127)) * sw
    B, Cin, Hh, Ww = x.shape
    g = Hh // patch
    xb = x.reshape(B, Cin, g, patch, g, patch).transpose(0, 2, 4, 1, 3, 5)
    xb = xb.reshape(B, g * g, Cin * patch * patch)
    wf = wq.reshape(wq.shape[0], -1)
    return xb @ wf.T + P["bias"]


def np_deit_forward(img_nchw, NP, cfg, bits):
    tokens = np_patch_embed(img_nchw, NP["patch_embed"], cfg.patch_size,
                            cfg.img_size)
    B = tokens.shape[0]
    C = cfg.embed_dim
    cls = np.broadcast_to(NP["cls_token"], (B, 1, C))
    dist = np.broadcast_to(NP["dist_token"], (B, 1, C))
    x = np.concatenate([cls, dist, tokens], axis=1) + NP["pos_embed"]
    for i in range(cfg.depth):
        Pb = NP[f"block{i}"]
        h = np_layernorm(x, Pb["ln1_g"], Pb["ln1_b"], cfg.ln_eps)
        x = x + np_attention(h, Pb, cfg.num_heads, bits)
        h = np_layernorm(x, Pb["ln2_g"], Pb["ln2_b"], cfg.ln_eps)
        h1 = np_qlinear(h, Pb["fc1"], bits, all_positive=False)
        h1 = np_gelu(h1)
        h2 = np_qlinear(h1, Pb["fc2"], bits, all_positive=True)
        x = x + h2
    x = np_layernorm(x, NP["ln_g"], NP["ln_b"], cfg.ln_eps)
    cls_logits = np_head(x[:, 0], NP["head"])
    dist_logits = np_head(x[:, 1], NP["head_dist"])
    return (cls_logits + dist_logits) / 2.0


# -------------------------------------------------- param tree extraction
def _np64(a):
    return np.asarray(a, np.float64)


def extract_np_params(p, cfg):
    """Our Flax params -> numpy-reference layout (torch conventions)."""

    def ql(m):
        return {
            "weight": _np64(m["kernel"]).T,
            "bias": _np64(m["bias"]) if "bias" in m else 0.0,
            "move_b4": _np64(m["move_b4"]["bias"]),
            "move_aft": _np64(m["move_aft"]["bias"]),
            "s": _np64(m["input_quant"]["s"]),
        }

    NP = {
        "cls_token": _np64(p["cls_token"]),
        "dist_token": _np64(p["dist_token"]),
        "pos_embed": _np64(p["pos_embed"]),
        "ln_g": _np64(p["norm"]["scale"]),
        "ln_b": _np64(p["norm"]["bias"]),
        "patch_embed": {
            "weight": _np64(p["patch_embed"]["kernel"]).transpose(3, 2, 0, 1),
            "bias": _np64(p["patch_embed"]["bias"]),
            "move_b4": _np64(p["patch_embed"]["move_b4"]["bias"]),
            "move_aft": _np64(p["patch_embed"]["move_aft"]["bias"]),
            "s_in": _np64(p["patch_embed"]["input_quant"]["s"]),
            "s_w": _np64(p["patch_embed"]["weight_quant"]["s"]),
        },
    }
    for head in ("head", "head_dist"):
        NP[head] = {
            "weight": _np64(p[head]["kernel"]).T,
            "bias": _np64(p[head]["bias"]),
            "move_b4": _np64(p[head]["move_b4"]["bias"]),
            "move_aft": _np64(p[head]["move_aft"]["bias"]),
            "s_in": _np64(p[head]["input_quant"]["s"]),
            "s_w": _np64(p[head]["weight_quant"]["s"]),
        }
    for i in range(cfg.depth):
        b = p[f"blocks_{i}"]
        a = b["attn"]
        NP[f"block{i}"] = {
            "ln1_g": _np64(b["norm1"]["scale"]),
            "ln1_b": _np64(b["norm1"]["bias"]),
            "ln2_g": _np64(b["norm2"]["scale"]),
            "ln2_b": _np64(b["norm2"]["bias"]),
            "qkv": ql(a["qkv"]),
            "proj": ql(a["proj"]),
            "move_qkv_b4": _np64(a["move_qkv_b4"]["bias"]),
            "move_q_aft": _np64(a["move_q_aft"]["bias"]),
            "move_k_aft": _np64(a["move_k_aft"]["bias"]),
            "move_v_aft": _np64(a["move_v_aft"]["bias"]),
            "s_q": _np64(a["quan_q"]["s"]),
            "s_k": _np64(a["quan_k"]["s"]),
            "s_v": _np64(a["quan_v"]["s"]),
            "s_softmax": _np64(a["quan_softmax"]["s"]),
            "fc1": ql(b["mlp"]["fc1"]),
            "fc2": ql(b["mlp"]["fc2"]),
        }
    return NP


class TestReferenceForwardParity:
    def test_quantized_deit_logits_match_numpy_reference(self):
        pol = policy_from_args(wq_bitw=BITS, aq_bitw=BITS,
                               qmodules=default_deit_qmodules(CFG.depth))
        model = VisionTransformer(cfg=CFG, policy=pol)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, CFG.img_size, CFG.img_size, 3)).astype(np.float32)
        variables = model.init({"params": jax.random.key(1)},
                               jnp.asarray(x), train=False)
        p = jax.tree.map(np.asarray, variables["params"])
        # randomize biases/scales so quantizer paths are non-trivial
        for path, leaf in jax.tree_util.tree_flatten_with_path(p)[0]:
            names = [getattr(k, "key", "") for k in path]
            if names[-1] == "bias" and names[-2].startswith("move"):
                _set_by_path(p, path, rng.normal(size=leaf.shape).astype(
                    np.float32) * 0.02)
        # heads init to zeros in DeiT; randomize so the comparison bites
        for head in ("head", "head_dist"):
            k = rng.normal(size=p[head]["kernel"].shape).astype(np.float32) * 0.05
            p[head]["kernel"] = k
            p[head]["weight_quant"]["s"] = (
                2 * np.abs(k.T).mean(axis=-1) / np.sqrt(127)).astype(np.float32)
        variables = {"params": jax.tree.map(jnp.asarray, p)}

        ours, _ = model.apply(variables, jnp.asarray(x), train=False)
        ours = np.asarray(ours)

        NP = extract_np_params(p, CFG)
        want = np_deit_forward(
            x.transpose(0, 3, 1, 2).astype(np.float64), NP, CFG, BITS)
        # float32 vs float64 ordering differences only
        np.testing.assert_allclose(ours, want, rtol=5e-3, atol=5e-4)
        # and the logits must be meaningfully nonzero for the test to bite
        assert np.abs(want).max() > 1e-3


class TestQKRAttentionParity:
    def test_qkr_attention_matches_numpy_reference(self):
        from ofq_tpu.nn import QAttentionQKR

        rng = np.random.default_rng(5)
        x = rng.normal(size=(2, 6, 12)).astype(np.float32)
        m = QAttentionQKR(num_heads=3, weight_bits=BITS, input_bits=BITS)
        v = m.init({"params": jax.random.key(7)}, jnp.asarray(x))
        p = jax.tree.map(np.asarray, v["params"])
        for mv in ("quant_x_move_b4", "quant_x_move_aft", "move_qkx_b4",
                   "move_qkx_aft", "move_v_b4", "move_v_aft"):
            p[mv]["bias"] = rng.normal(
                size=p[mv]["bias"].shape).astype(np.float32) * 0.02
        ours, _ = m.apply({"params": jax.tree.map(jnp.asarray, p)},
                          jnp.asarray(x))
        P = {
            "x_move_b4": _np64(p["quant_x_move_b4"]["bias"]),
            "x_move_aft": _np64(p["quant_x_move_aft"]["bias"]),
            "s_x": _np64(p["quant_x"]["s"]),
            "v_weight": _np64(p["v_kernel"]).T,
            "v_bias": _np64(p["v_bias"]),
            "move_v_b4": _np64(p["move_v_b4"]["bias"]),
            "move_v_aft": _np64(p["move_v_aft"]["bias"]),
            "s_v": _np64(p["quan_v"]["s"]),
            "q_weight": _np64(p["q_kernel"]).T,
            "k_weight": _np64(p["k_kernel"]).T,
            "move_qkx_b4": _np64(p["move_qkx_b4"]["bias"]),
            "move_qkx_aft": _np64(p["move_qkx_aft"]["bias"]),
            "s_qkx": _np64(p["quan_qkx"]["s"]),
            "s_softmax": _np64(p["quan_softmax"]["s"]),
            "proj": {
                "weight": _np64(p["proj"]["kernel"]).T,
                "bias": _np64(p["proj"]["bias"]),
                "move_b4": _np64(p["proj"]["move_b4"]["bias"]),
                "move_aft": _np64(p["proj"]["move_aft"]["bias"]),
                "s": _np64(p["proj"]["input_quant"]["s"]),
            },
        }
        want = np_attention_qkr(_np64(x), P, 3, BITS)
        np.testing.assert_allclose(np.asarray(ours), want,
                                   rtol=5e-3, atol=5e-4)


def _set_by_path(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node[getattr(k, "key")]
    node[getattr(path[-1], "key")] = value


def np_swin_attention(x_bhwc, P, H, window, shift, bits):
    """Quantized shifted-window attention transcribed from
    swin_attention_and_mlp.py:143-251 (torch conventions)."""
    B, Hh, Ww, C = x_bhwc.shape
    d = C // H
    pad_r = (window - Ww % window) % window
    pad_b = (window - Hh % window) % window
    x = np.pad(x_bhwc, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    pH, pW = Hh + pad_b, Ww + pad_r
    if window >= pH or window >= pW:
        shift = 0
    if shift > 0:
        x = np.roll(x, (-shift, -shift), axis=(1, 2))
    nW = (pH // window) * (pW // window)
    xw = x.reshape(B, pH // window, window, pW // window, window, C)
    xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(B * nW, window * window, C)
    n = window * window

    qkv = np_qlinear(xw, P["qkv"], bits) + P["move_qkv_b4"]
    qkv = qkv.reshape(B * nW, n, 3, H, d).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = np_lsq(q, P["s_q"], bits, False, axis=-2)
    k = np_lsq(k, P["s_k"], bits, False, axis=-2)
    v = v.transpose(0, 2, 1, 3).reshape(B * nW, n, C)
    v = np_lsq(v, P["s_v"], bits, False, axis=-1)
    q = q.transpose(0, 2, 1, 3).reshape(B * nW, n, C) + P["move_q_aft"]
    k = k.transpose(0, 2, 1, 3).reshape(B * nW, n, C) + P["move_k_aft"]
    v = v + P["move_v_aft"]
    q = q.reshape(B * nW, n, H, d).transpose(0, 2, 1, 3)
    k = k.reshape(B * nW, n, H, d).transpose(0, 2, 1, 3)
    v = v.reshape(B * nW, n, H, d).transpose(0, 2, 1, 3)

    attn = q @ k.transpose(0, 1, 3, 2) * (d ** -0.5)
    # relative position bias
    wh = ww = window
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    idx = rel.sum(-1).reshape(-1)
    bias = P["rel_bias_table"][idx].reshape(n, n, H).transpose(2, 0, 1)
    attn = attn + bias[None]
    if shift > 0:
        img = np.zeros((pH, pW), np.float32)
        cnt = 0
        for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
                img[hs, ws] = cnt
                cnt += 1
        img = img.reshape(pH // window, window, pW // window, window)
        img = img.transpose(0, 2, 1, 3).reshape(nW, n)
        diff = img[:, None, :] - img[:, :, None]
        mask = np.where(diff != 0, -100.0, 0.0).astype(np.float32)
        attn = attn.reshape(B, nW, H, n, n) + mask[None, :, None]
        attn = attn.reshape(B * nW, H, n, n)
    attn = np.exp(attn - attn.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    attn = np_lsq(attn, P["s_softmax"], bits, True, axis=-2)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(B * nW, n, C)
    out = np_qlinear(out, P["proj"], bits)
    out = out.reshape(B, pH // window, pW // window, window, window, C)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, pH, pW, C)
    if shift > 0:
        out = np.roll(out, (shift, shift), axis=(1, 2))
    return out[:, :Hh, :Ww]


class TestSwinAttentionParity:
    @pytest.mark.parametrize("shift", [0, 2])
    def test_quantized_window_attention_matches_numpy(self, shift):
        from ofq_tpu.models.swin import QSwinAttention

        rng = np.random.default_rng(6)
        B, Hh, Ww, C, H, window = 2, 8, 8, 12, 3, 4
        x = rng.normal(size=(B, Hh, Ww, C)).astype(np.float32)
        m = QSwinAttention(dim=C, num_heads=H, window_size=window,
                           shift_size=shift, weight_bits=BITS,
                           input_bits=BITS)
        v = m.init({"params": jax.random.key(3)}, jnp.asarray(x))
        p = jax.tree.map(np.asarray, v["params"])
        for mv in ("move_qkv_b4", "move_q_aft", "move_k_aft", "move_v_aft"):
            p[mv]["bias"] = rng.normal(
                size=p[mv]["bias"].shape).astype(np.float32) * 0.02
        ours, _ = m.apply({"params": jax.tree.map(jnp.asarray, p)},
                          jnp.asarray(x))

        def ql(mm):
            return {"weight": _np64(mm["kernel"]).T, "bias": _np64(mm["bias"]),
                    "move_b4": _np64(mm["move_b4"]["bias"]),
                    "move_aft": _np64(mm["move_aft"]["bias"]),
                    "s": _np64(mm["input_quant"]["s"])}

        P = {
            "qkv": ql(p["qkv"]), "proj": ql(p["proj"]),
            "move_qkv_b4": _np64(p["move_qkv_b4"]["bias"]),
            "move_q_aft": _np64(p["move_q_aft"]["bias"]),
            "move_k_aft": _np64(p["move_k_aft"]["bias"]),
            "move_v_aft": _np64(p["move_v_aft"]["bias"]),
            "s_q": _np64(p["quan_q"]["s"]), "s_k": _np64(p["quan_k"]["s"]),
            "s_v": _np64(p["quan_v"]["s"]),
            "s_softmax": _np64(p["quan_softmax"]["s"]),
            "rel_bias_table": _np64(p["relative_position_bias_table"]),
        }
        want = np_swin_attention(_np64(x), P, H, window, shift, BITS)
        np.testing.assert_allclose(np.asarray(ours), want,
                                   rtol=5e-3, atol=5e-4)
