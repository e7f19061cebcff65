"""Integer-core QLinear (--matmul-impl int8): the int8 factorized forward
and its custom-VJP backward must reproduce the composed XLA path.

The factorization y = (X_int @ W_int) * (s_a * s_w / 2n) + b_post @ w_q is
EXACT in real arithmetic; in fp32 the two paths differ only by rounding
(the integer path accumulates exactly in int32), so tight tolerances."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofq_tpu.nn.linear import QLinear


def _build(matmul_impl, bits_w=2, bits_a=2, symmetric=True, feat=16):
    return QLinear(feat, weight_bits=bits_w, input_bits=bits_a,
                   symmetric=symmetric, matmul_impl=matmul_impl)


@pytest.mark.parametrize("bits", [2, 3, 4])
@pytest.mark.parametrize("symmetric", [True, False])
def test_forward_matches_composed(bits, symmetric):
    rng = np.random.default_rng(bits)
    x = jnp.asarray(rng.normal(size=(4, 9, 24)), jnp.float32)
    ref = _build(None, bits, bits, symmetric)
    params = ref.init({"params": jax.random.key(0)}, x)
    # perturb so biases/scales are non-trivial
    p = jax.tree.map(lambda v: v + 0.01 * rng.standard_normal(v.shape
                                                              ).astype(v.dtype),
                     params)
    want = ref.apply(p, x)
    got = _build("int8", bits, bits, symmetric).apply(p, x)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_gradients_match_composed():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 9, 24)), jnp.float32)
    ref = _build(None)
    int8 = _build("int8")
    params = ref.init({"params": jax.random.key(0)}, x)
    p = jax.tree.map(
        lambda v: v + 0.01 * rng.standard_normal(v.shape).astype(v.dtype),
        params)

    def loss(model, p, x):
        y = model.apply(p, x)
        return jnp.sum(jnp.sin(y))  # nontrivial cotangents

    g_ref, gx_ref = jax.grad(lambda p, x: loss(ref, p, x),
                             argnums=(0, 1))(p, x)
    g_int, gx_int = jax.grad(lambda p, x: loss(int8, p, x),
                             argnums=(0, 1))(p, x)
    np.testing.assert_allclose(gx_int, gx_ref, rtol=1e-4, atol=1e-5)
    flat_r = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_i = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_flatten_with_path(g_int)[0]}
    for k, v in flat_r:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            flat_i[ks], v, rtol=1e-4, atol=1e-5, err_msg=ks)


def test_w8_falls_back_to_xla():
    # W8 codes (2k+1 up to 255) don't fit int8: the module must fall back
    # to the composed path with an identical param tree
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 5, 8)), jnp.float32)
    ref = _build(None, 8, 8)
    i8 = _build("int8", 8, 8)
    params = ref.init({"params": jax.random.key(0)}, x)
    np.testing.assert_array_equal(i8.apply(params, x), ref.apply(params, x))


def test_asymmetric_a8_falls_back_to_xla():
    # unsigned/asymmetric 8-bit activation codes span 0..255 and overflow
    # the int8 cast (250 wraps to -6): int8_eligible must reject
    # (all_positive, a_bits=8) so the module takes the composed path
    rng = np.random.default_rng(4)
    # large positive inputs drive codes above 127 under asymmetric LSQ
    x = jnp.asarray(np.abs(rng.normal(size=(2, 5, 8))) * 4.0, jnp.float32)
    ref = _build(None, 2, 8, symmetric=False)
    i8 = _build("int8", 2, 8, symmetric=False)
    params = ref.init({"params": jax.random.key(0)}, x)
    np.testing.assert_array_equal(i8.apply(params, x), ref.apply(params, x))


def test_qkr_attention_int8_matches_composed():
    """QAttentionQKR with matmul_impl='int8': shared-X_int v/qkx dots must
    reproduce the composed path's forward and gradients (same param
    tree, LSQ algebra outside the integer dots)."""
    from ofq_tpu.nn.attention import QAttentionQKR

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 10, 24)), jnp.float32)
    kw = dict(num_heads=2, weight_bits=2, input_bits=2)
    ref = QAttentionQKR(**kw)
    i8 = QAttentionQKR(matmul_impl="int8", **kw)
    params = ref.init({"params": jax.random.key(0)}, x)
    p = jax.tree.map(
        lambda v: v + 0.01 * rng.standard_normal(v.shape).astype(v.dtype),
        params)
    want, _ = ref.apply(p, x)
    got, _ = i8.apply(p, x)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def loss(model, p):
        y, _ = model.apply(p, x)
        return jnp.sum(jnp.sin(y))

    g_ref = jax.grad(lambda p: loss(ref, p))(p)
    g_int = jax.grad(lambda p: loss(i8, p))(p)
    flat_r = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_i = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_flatten_with_path(g_int)[0]}
    for k, v in flat_r:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            flat_i[ks], v, rtol=2e-3, atol=2e-4, err_msg=ks)


def test_bf16_stream_int8_matches_bf16_composed():
    # under the bf16 stream both paths make the SAME (bf16) quantization
    # decisions (u = x1/s in bf16); they differ only in accumulation —
    # the int path sums exactly in int32, the composed path rounds each
    # product to bf16.  So int8-bf16 must track composed-bf16 to within
    # bf16 accumulation noise (and is the more accurate of the two).
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 9, 24)), jnp.bfloat16)
    ref = QLinear(16, weight_bits=2, input_bits=2, symmetric=True,
                  compute_dtype=jnp.bfloat16)
    params = ref.init({"params": jax.random.key(0)}, x)
    int8 = QLinear(16, weight_bits=2, input_bits=2, symmetric=True,
                   matmul_impl="int8", compute_dtype=jnp.bfloat16)
    got = np.asarray(int8.apply(params, x), np.float32)
    want = np.asarray(ref.apply(params, x), np.float32)
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_int8_statsq_qkx_matches_composed_einsum():
    """The layout-preserving QKR qkx op: forward and every cotangent must
    reproduce the composed `einsum('bnj,hij->bnhi', xi*s+bx, StatsQ(w))`
    chain (StatsQ per row of the (H*C, C) product, reduce_axis=-1)."""
    from ofq_tpu.ops.int8_qlinear import int8_statsq_qkx
    from ofq_tpu.quant.statsq import statsq_quantize

    rng = np.random.default_rng(7)
    B, N, C, H, bits = 2, 5, 8, 2, 2
    xi = jnp.asarray(rng.integers(-2, 2, size=(B, N, C)), jnp.float32)
    s_eff = jnp.asarray(np.abs(rng.normal(size=(1, N, 1))) + 0.3,
                        jnp.float32)
    bx = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    w_qk = jnp.asarray(rng.normal(size=(H * C, C)), jnp.float32)

    def composed(xi, s_eff, bx, w_qk):
        xq = xi * s_eff + bx
        wq = statsq_quantize(
            w_qk.reshape(H * C, C), bits, reduce_axis=-1).reshape(H, C, C)
        return jnp.einsum("bnj,hij->bnhi", xq, wq)

    w_qk = w_qk.reshape(H, C, C)  # the op takes the per-head tensor
    want = composed(xi, s_eff, bx, w_qk)
    got = int8_statsq_qkx(xi, s_eff, bx, w_qk, bits)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def loss(f, *args):
        return jnp.sum(jnp.sin(f(*args)))

    g_ref = jax.grad(lambda *a: loss(composed, *a), argnums=(0, 1, 2, 3))(
        xi, s_eff, bx, w_qk)
    g_int = jax.grad(
        lambda xi, s, b, w: loss(int8_statsq_qkx, xi, s, b, w, bits),
        argnums=(0, 1, 2, 3))(xi, s_eff, bx, w_qk)
    for r, i, name in zip(g_ref, g_int, ("dxi", "ds_eff", "dbx", "dw_qk")):
        np.testing.assert_allclose(i, r, rtol=1e-4, atol=1e-5, err_msg=name)
