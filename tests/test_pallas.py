"""Pallas fused StatsQ-matmul parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofq_tpu.ops.pallas_statsq import pallas_statsq_matmul
from ofq_tpu.ops.statsq_matmul import statsq_matmul


@pytest.mark.parametrize("shape", [
    (64, 96, 48),          # M, K, N — non-tile-aligned
    (256, 128, 128),       # aligned
    (100, 192, 576),       # DeiT-T qkv-ish
])
@pytest.mark.parametrize("bits", [2, 4])
def test_forward_parity(shape, bits):
    M, K, N = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)) * 0.05, jnp.float32)
    want = statsq_matmul(x, w, bits, impl="xla")
    got = pallas_statsq_matmul(x, w, bits, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_forward_parity_3d():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 10, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 32)) * 0.05, jnp.float32)
    want = statsq_matmul(x, w, 2, impl="xla")
    got = pallas_statsq_matmul(x, w, 2, interpret=True)
    assert got.shape == (2, 10, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_gradient_parity():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(32, 48)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(48, 24)) * 0.05, jnp.float32)
    cot = jnp.asarray(rng.normal(size=(32, 24)), jnp.float32)

    def loss_ref(x, w):
        return jnp.sum(statsq_matmul(x, w, 2, impl="xla") * cot)

    def loss_pal(x, w):
        return jnp.sum(pallas_statsq_matmul(x, w, 2, interpret=True) * cot)

    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    gx_p, gw_p = jax.grad(loss_pal, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-4)


def test_qlinear_with_pallas_impl():
    """QLinear(matmul_impl='pallas') must agree with the XLA path."""
    from ofq_tpu.nn import QLinear
    from ofq_tpu.ops import pallas_statsq

    # monkeypatch interpret mode for CPU testing
    orig = pallas_statsq.pallas_statsq_matmul

    def interp(x, k, b, **kw):
        kw["interpret"] = True
        return orig(x, k, b, **kw)

    pallas_statsq.pallas_statsq_matmul = interp
    try:
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 6, 16)), jnp.float32)
        m_x = QLinear(8, weight_bits=2, input_bits=2, matmul_impl="xla")
        m_p = QLinear(8, weight_bits=2, input_bits=2, matmul_impl="pallas")
        params = m_x.init({"params": jax.random.key(0)}, x)
        y_x = m_x.apply(params, x)
        y_p = m_p.apply(params, x)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                                   rtol=1e-4, atol=1e-4)
    finally:
        pallas_statsq.pallas_statsq_matmul = orig
