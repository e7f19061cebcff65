"""Parity of the fused Pallas attention core against the XLA composition.

The kernel must reproduce the composed reference semantics exactly:
softmax -> all-positive LSQ (value AND every cotangent: lhs, rhs, v, s
with in-range masking and the round(u)-u / clamp-bound scale gradient).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofq_tpu.ops.fused_attention import quantized_attention_core
from ofq_tpu.quant.lsq import lsq_quantize

B, N, H, K, D = 2, 12, 3, 16, 8
BITS = 2


def composition(lhs, rhs, v, s, quantize=True, sm_scale=0.25):
    if lhs.ndim == 3:
        attn = jnp.einsum("bnc,bmhc->bhnm", lhs, rhs) * sm_scale
    else:
        attn = jnp.einsum("bnhd,bmhd->bhnm", lhs, rhs) * sm_scale
    attn = jax.nn.softmax(attn, axis=-1)
    if quantize:
        attn = lsq_quantize(attn, s, BITS, all_positive=True, channel_axis=-2)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v)


def fused(lhs, rhs, v, s, quantize=True, sm_scale=0.25):
    # the kernel expects the LSQ grad-scale factor pre-applied by the
    # caller (the module glue does this); lsq_quantize applies it
    # internally, so mirror it here for cotangent parity
    from ofq_tpu.quant.lsq import grad_scale_factor
    from ofq_tpu.quant.ste import grad_scale

    Bv, Hv = rhs.shape[0], rhs.shape[2]
    gf = grad_scale_factor((Bv, Hv, N, N), BITS, True, -2)
    return quantized_attention_core(
        lhs, rhs, v, grad_scale(s, gf), bits=BITS, sm_scale=sm_scale,
        quantize_softmax=quantize, interpret=True)


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape), jnp.float32)


class TestFusedAttentionParity:
    @pytest.mark.parametrize("shared_lhs", [True, False])
    @pytest.mark.parametrize("quantize", [True, False])
    def test_forward_and_grads(self, shared_lhs, quantize):
        lhs = _rand((B, N, K) if shared_lhs else (B, N, H, K), 0)
        rhs = _rand((B, N, H, K), 1)
        v = _rand((B, N, H, D), 2)
        s = jnp.abs(_rand((N,), 3)) * 0.05 + 0.02

        def loss_c(*a):
            return jnp.sum(jnp.sin(composition(*a, quantize=quantize)))

        def loss_f(*a):
            return jnp.sum(jnp.sin(fused(*a, quantize=quantize)))

        yc = composition(lhs, rhs, v, s, quantize=quantize)
        yf = fused(lhs, rhs, v, s, quantize=quantize)
        np.testing.assert_allclose(yf, yc, rtol=1e-5, atol=1e-5)

        gc = jax.grad(loss_c, argnums=(0, 1, 2, 3))(lhs, rhs, v, s)
        gf = jax.grad(loss_f, argnums=(0, 1, 2, 3))(lhs, rhs, v, s)
        for a, b, name in zip(gc, gf, ["lhs", "rhs", "v", "s"]):
            if not quantize and name == "s":
                continue  # scale unused without the quantizer
            np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5,
                                       err_msg=name)

    def test_bf16_stream(self):
        lhs = _rand((B, N, K), 0).astype(jnp.bfloat16)
        rhs = _rand((B, N, H, K), 1).astype(jnp.bfloat16)
        v = _rand((B, N, H, D), 2).astype(jnp.bfloat16)
        s = jnp.abs(_rand((N,), 3)) * 0.05 + 0.02
        yf = fused(lhs, rhs, v, s)
        yc = composition(lhs, rhs, v, s)
        assert yf.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            yf.astype(jnp.float32), yc.astype(jnp.float32),
            rtol=5e-2, atol=5e-2)

    @pytest.mark.parametrize("impl", ["fused", "remat"])
    def test_module_level_equivalence(self, impl):
        """QAttentionQKR with attn_impl='fused'/'remat' must match
        attn_impl=None (same params, same outputs, same grads) on CPU."""
        from ofq_tpu.nn.attention import QAttentionQKR

        x = _rand((2, 12, 24), 5)
        mods = {}
        for i in [None, impl]:
            mods[i] = QAttentionQKR(num_heads=3, weight_bits=2, input_bits=2,
                                    attn_impl=i)
        params = mods[None].init({"params": jax.random.key(0)}, x)

        def run(i, p):
            out, _ = mods[i].apply(p, x)
            return out

        y_ref = run(None, params)
        y_fused = run(impl, params)
        np.testing.assert_allclose(y_fused, y_ref, rtol=1e-5, atol=1e-5)

        g_ref = jax.grad(lambda p: jnp.sum(run(None, p) ** 2))(params)
        g_fused = jax.grad(lambda p: jnp.sum(run(impl, p) ** 2))(params)
        flat_r = jax.tree.leaves_with_path(g_ref)
        flat_f = jax.tree.leaves(g_fused)
        for (path, a), b in zip(flat_r, flat_f):
            np.testing.assert_allclose(
                b, a, rtol=2e-4, atol=1e-5, err_msg=str(path))
