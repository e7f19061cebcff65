"""Fused QLinear (integer-core kernel) vs composed path: value + grad parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ofq_tpu.ops.fused_qlinear as fq
from ofq_tpu.nn import QLinear


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = fq.fused_qlinear

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(fq, "fused_qlinear", interp)
    yield


def _setup(symmetric=True, bits=2, B=2, N=10, K=48, F=24, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, N, K)), jnp.float32)
    if not symmetric:
        x = jnp.abs(x)
    m_ref = QLinear(F, weight_bits=bits, input_bits=bits, symmetric=symmetric)
    m_fused = QLinear(F, weight_bits=bits, input_bits=bits,
                      symmetric=symmetric, matmul_impl="fused")
    params = m_ref.init({"params": jax.random.key(seed)}, x)
    # nudge biases/scales off their init so the test is non-trivial
    p = params["params"]
    p["move_b4"]["bias"] = jnp.asarray(rng.normal(size=(K,)) * 0.05, jnp.float32)
    p["move_aft"]["bias"] = jnp.asarray(rng.normal(size=(K,)) * 0.05, jnp.float32)
    p["bias"] = jnp.asarray(rng.normal(size=(F,)) * 0.1, jnp.float32)
    params = {"params": p}
    return m_ref, m_fused, params, x


class TestFusedQLinear:
    def test_param_tree_identical(self):
        m_ref, m_fused, params, x = _setup()
        pf = m_fused.init({"params": jax.random.key(0)}, x)
        ref_paths = set(
            jax.tree_util.keystr(k)
            for k, _ in jax.tree_util.tree_flatten_with_path(params)[0])
        fused_paths = set(
            jax.tree_util.keystr(k)
            for k, _ in jax.tree_util.tree_flatten_with_path(pf)[0])
        assert ref_paths == fused_paths

    @pytest.mark.parametrize("symmetric,bits", [(True, 2), (False, 2),
                                                (True, 4), (False, 3)])
    def test_forward_parity(self, symmetric, bits):
        m_ref, m_fused, params, x = _setup(symmetric, bits)
        y_ref = m_ref.apply(params, x)
        y_fused = m_fused.apply(params, x)
        np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("symmetric", [True, False])
    def test_grad_parity(self, symmetric):
        m_ref, m_fused, params, x = _setup(symmetric)
        cot = jnp.asarray(
            np.random.default_rng(9).normal(size=(2, 10, 24)), jnp.float32)

        def loss(m):
            return lambda p, x: jnp.sum(m.apply(p, x) * cot)

        (gr_p, gr_x) = jax.grad(loss(m_ref), argnums=(0, 1))(params, x)
        (gf_p, gf_x) = jax.grad(loss(m_fused), argnums=(0, 1))(params, x)
        np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gr_x),
                                   rtol=1e-4, atol=1e-5)
        flat_r = jax.tree_util.tree_flatten_with_path(gr_p)[0]
        flat_f = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_flatten_with_path(gf_p)[0])
        for k, v in flat_r:
            ks = jax.tree_util.keystr(k)
            np.testing.assert_allclose(
                np.asarray(flat_f[ks]), np.asarray(v),
                rtol=1e-4, atol=1e-5, err_msg=ks)

    def test_aq_not_learnable_stops_s_grad(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 6, 16)), jnp.float32)
        m = QLinear(8, weight_bits=2, input_bits=2, aq_learnable=False,
                    matmul_impl="fused")
        params = m.init({"params": jax.random.key(0)}, x)
        g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(params)
        np.testing.assert_allclose(
            np.asarray(g["params"]["input_quant"]["s"]), 0.0)


class TestFused4D:
    def test_swin_style_4d_input_parity(self):
        """Swin quantized linears run on 4-D (B,H,W,C): the fused kernel
        must tile the per-width-column scale correctly."""
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(2, 4, 6, 16)), jnp.float32)
        m_ref = QLinear(8, weight_bits=2, input_bits=2)
        m_f = QLinear(8, weight_bits=2, input_bits=2, matmul_impl="fused")
        params = m_ref.init({"params": jax.random.key(0)}, x)
        assert params["params"]["input_quant"]["s"].shape == (6,)
        y_ref = m_ref.apply(params, x)
        y_f = m_f.apply(params, x)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-5)

    def test_no_bias_reduction_style(self):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(2, 5, 12)), jnp.float32)
        m_ref = QLinear(6, weight_bits=2, input_bits=2, use_bias=False)
        m_f = QLinear(6, weight_bits=2, input_bits=2, use_bias=False,
                      matmul_impl="fused")
        params = m_ref.init({"params": jax.random.key(0)}, x)
        np.testing.assert_allclose(
            np.asarray(m_f.apply(params, x)),
            np.asarray(m_ref.apply(params, x)), rtol=2e-5, atol=2e-5)
