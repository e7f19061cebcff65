"""Tests for quantized Flax layers (QLinear/QMlp/heads/conv/attention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofq_tpu.nn import (
    Attention,
    LearnableBias,
    LsqAct,
    QAttention,
    QAttentionQKR,
    QHeadLinear,
    QLinear,
    QMlp,
    QPatchEmbedConv,
)
from ofq_tpu.quant.statsq import statsq_quantize


def rngs():
    return {"params": jax.random.key(0)}


class TestQLinear:
    def test_forward_matches_manual(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 8)), jnp.float32)
        m = QLinear(4, weight_bits=2, input_bits=2)
        params = m.init(rngs(), x)
        y = m.apply(params, x)
        assert y.shape == (2, 5, 4)
        # manual recompute: biases are zero at init, so y = lsq(x) @ statsq(W) + b
        p = params["params"]
        kernel = p["kernel"]
        s = p["input_quant"]["s"]
        from ofq_tpu.quant.lsq import lsq_quantize

        xq = lsq_quantize(x, s, 2, all_positive=False, channel_axis=-2)
        want = xq @ statsq_quantize(kernel, 2) + p["bias"]
        np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=1e-5, atol=1e-6)

    def test_lsq_scale_shape_is_per_token(self):
        x = jnp.ones((2, 7, 8))
        m = QLinear(4, weight_bits=2, input_bits=2)
        params = m.init(rngs(), x)
        assert params["params"]["input_quant"]["s"].shape == (7,)

    def test_asymmetric_uses_all_positive(self):
        x = jnp.abs(jnp.asarray(np.random.default_rng(1).normal(size=(2, 3, 8)), jnp.float32))
        m = QLinear(4, weight_bits=2, input_bits=2, symmetric=False)
        params = m.init(rngs(), x)
        # all_positive init: 4*mean/sqrt(thd=3)
        s = params["params"]["input_quant"]["s"]
        want = 4 * np.mean(np.abs(np.asarray(x)), axis=(0, 2)) / np.sqrt(3)
        np.testing.assert_allclose(np.asarray(s), want, rtol=1e-5)

    def test_fp32_bits_bypass(self):
        x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 3, 8)), jnp.float32)
        m = QLinear(4, weight_bits=32, input_bits=32)
        params = m.init(rngs(), x)
        y = m.apply(params, x)
        want = x @ params["params"]["kernel"] + params["params"]["bias"]
        np.testing.assert_allclose(np.asarray(y), np.asarray(want), rtol=1e-6)
        # no quantizer params created
        assert "input_quant" not in params["params"]


class TestQMlp:
    def test_fc2_is_asymmetric(self):
        x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 4, 8)), jnp.float32)
        m = QMlp(hidden_features=16, out_features=8, weight_bits=2, input_bits=2)
        params = m.init(rngs(), x)
        y = m.apply(params, x)
        assert y.shape == (2, 4, 8)
        # fc2's input quantizer should use the all_positive init (post-GELU)
        # -> its scale differs from a signed init of the same data
        assert "fc1" in params["params"] and "fc2" in params["params"]


class TestQHead:
    def test_w8a8_shapes(self):
        x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 16)), jnp.float32)
        m = QHeadLinear(10)
        params = m.init(rngs(), x)
        y = m.apply(params, x)
        assert y.shape == (2, 10)
        # per-tensor input scale, per-row weight scale
        assert params["params"]["input_quant"]["s"].shape == (1,)
        assert params["params"]["weight_quant"]["s"].shape == (10,)


class TestQPatchEmbed:
    def test_patchify_shapes(self):
        x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 32, 32, 3)), jnp.float32)
        m = QPatchEmbedConv(features=24, patch_size=(8, 8), img_size=(32, 32))
        params = m.init(rngs(), x)
        y = m.apply(params, x)
        assert y.shape == (2, 4, 4, 24)
        assert params["params"]["move_b4"]["bias"].shape == (32, 32)
        assert params["params"]["weight_quant"]["s"].shape == (24,)
        assert params["params"]["input_quant"]["s"].shape == (3,)


class TestAttention:
    def test_float_attention_qqkkvv(self):
        x = jnp.asarray(np.random.default_rng(6).normal(size=(2, 6, 12)), jnp.float32)
        m = Attention(num_heads=3, qqkkvv=True)
        params = m.init(rngs(), x)
        out, info = m.apply(params, x)
        assert out.shape == (2, 6, 12)
        assert len(info) == 4
        attn = info[0]
        np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, rtol=1e-5)
        assert info[1].shape == (2, 3, 6, 6)

    def test_qattention_shapes_and_quantizers(self):
        x = jnp.asarray(np.random.default_rng(7).normal(size=(2, 6, 12)), jnp.float32)
        m = QAttention(num_heads=3, weight_bits=2, input_bits=2)
        params = m.init(rngs(), x)
        out, info = m.apply(params, x)
        assert out.shape == (2, 6, 12)
        p = params["params"]
        assert p["quan_q"]["s"].shape == (6,)       # per-token on (B,H,N,d)
        assert p["quan_v"]["s"].shape == (12,)      # per-channel on (B,N,C)
        assert p["quan_softmax"]["s"].shape == (6,)  # per-token on (B,H,N,N)
        assert p["move_qkv_b4"]["bias"].shape == (36,)

    def test_qkr_structure(self):
        x = jnp.asarray(np.random.default_rng(8).normal(size=(2, 6, 12)), jnp.float32)
        m = QAttentionQKR(num_heads=3, weight_bits=2, input_bits=2)
        params = m.init(rngs(), x)
        out, info = m.apply(params, x)
        assert out.shape == (2, 6, 12)
        p = params["params"]
        assert p["q_kernel"].shape == (12, 12)
        assert p["v_kernel"].shape == (12, 12)
        assert "qkv" not in p  # fused qkv is gone under QKR
        # qkx quantizer: one scale per (token, head) pair
        assert p["quan_qkx"]["s"].shape == (6 * 3,)
        assert p["move_qkx_b4"]["bias"].shape == (3 * 12,)

    def test_qkr_wqk_algebra_matches_torch_convention(self):
        # W_qk[h,i,j] = sum_d Wq_torch[h*dh+d, i] * Wk_torch[h*dh+d, j]
        rng = np.random.default_rng(9)
        C, H = 8, 2
        d = C // H
        wq_t = rng.normal(size=(C, C)).astype(np.float32)  # torch (out,in)
        wk_t = rng.normal(size=(C, C)).astype(np.float32)
        want = np.zeros((H, C, C), np.float32)
        for h in range(H):
            want[h] = wq_t[h * d:(h + 1) * d].T @ wk_t[h * d:(h + 1) * d]
        q_kernel = jnp.asarray(wq_t.T)  # flax (in,out)
        k_kernel = jnp.asarray(wk_t.T)
        qh = q_kernel.reshape(C, H, d)
        kh = k_kernel.reshape(C, H, d)
        got = jnp.einsum("ihd,jhd->hij", qh, kh)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


class TestLearnableBias:
    def test_broadcast(self):
        x = jnp.zeros((2, 3, 4))
        m = LearnableBias(4)
        params = m.init(rngs(), x)
        params = jax.tree.map(lambda p: p + 1.0, params)
        np.testing.assert_allclose(np.asarray(m.apply(params, x)), 1.0)


class TestIterativeFreezingWeight:
    def test_tracks_and_freezes(self):
        import jax
        from ofq_tpu.nn.quantizers import LsqWeightIterativeFreezing

        m = LsqWeightIterativeFreezing(bit=2, freeze_momentum=0.5,
                                       freeze_threshold=0.4)
        w = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)) * 0.1,
                        jnp.float32)
        variables = m.init({"params": jax.random.key(0)}, w, training=False)
        assert "oscillation" in variables
        # flip the weights back and forth -> integer oscillation -> freeze
        v = variables
        for i in range(4):
            sign = 1.0 if i % 2 == 0 else -1.0
            _, upd = m.apply(v, w + sign * 0.2, training=True,
                             mutable=["oscillation"])
            v = {**v, **upd}
        frozen = v["oscillation"]["state"].frozen
        assert bool(frozen.any())
        # eval applies the frozen integers without mutation
        y = m.apply(v, w, training=False)
        assert y.shape == w.shape
