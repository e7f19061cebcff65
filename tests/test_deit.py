"""Model-level tests for the DeiT family (tiny configs on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofq_tpu.models import DeiTConfig, VisionTransformer, create_model
from ofq_tpu.quant import QuantPolicy, default_deit_qmodules, policy_from_args

TINY = DeiTConfig(img_size=32, patch_size=8, embed_dim=24, depth=2,
                  num_heads=3, num_classes=10)


def make(policy=QuantPolicy(), **over):
    cfg = dataclasses.replace(TINY, **over) if over else TINY
    return VisionTransformer(cfg=cfg, policy=policy)


def x_batch(b=2, s=32):
    return jnp.asarray(
        np.random.default_rng(0).normal(size=(b, s, s, 3)).astype(np.float32))


class TestFloatModel:
    def test_eval_returns_avg_logits(self):
        m = make()
        x = x_batch()
        params = m.init({"params": jax.random.key(0)}, x)
        logits, info = m.apply(params, x, train=False)
        assert logits.shape == (2, 10)
        assert info is None

    def test_train_returns_both_heads(self):
        m = make()
        x = x_batch()
        params = m.init({"params": jax.random.key(0)}, x)
        (cls, dist), info = m.apply(
            params, x, train=True,
            rngs={"dropout": jax.random.key(1), "droppath": jax.random.key(2)})
        assert cls.shape == (2, 10) and dist.shape == (2, 10)

    def test_undistilled_single_head(self):
        m = make(distilled=False)
        x = x_batch()
        params = m.init({"params": jax.random.key(0)}, x)
        logits, _ = m.apply(params, x, train=False)
        assert logits.shape == (2, 10)
        assert "head_dist" not in params["params"]

    def test_qqkkvv_attn_info(self):
        m = make(qqkkvv=True)
        x = x_batch()
        params = m.init({"params": jax.random.key(0)}, x)
        _, info = m.apply(params, x, train=False)
        assert len(info) == 2  # one tuple per block
        assert len(info[0]) == 4
        # N = 16 patches + 2 tokens
        assert info[0][0].shape == (2, 3, 18, 18)


class TestQuantModel:
    def test_policy_pins_w8a8_edges(self):
        pol = policy_from_args(
            wq_bitw=2, aq_bitw=2,
            qmodules=default_deit_qmodules(2))
        m = make(pol)
        x = x_batch()
        params = m.init({"params": jax.random.key(0)}, x)
        p = params["params"]
        # patch embed + heads exist as quantized modules with 8-bit scales
        assert "weight_quant" in p["patch_embed"]
        assert "weight_quant" in p["head"]
        assert "weight_quant" in p["head_dist"]
        # block linears are statsq: no weight scale param, only input LSQ
        blk = p["blocks_0"]["attn"]["qkv"]
        assert "input_quant" in blk and "weight_quant" not in blk

    def test_partial_qmodules(self):
        # quantize only block 0's mlp; block 1 stays float
        pol = policy_from_args(wq_bitw=2, aq_bitw=2, qmodules=("blocks.0.mlp",))
        m = make(pol)
        x = x_batch()
        params = m.init({"params": jax.random.key(0)}, x)
        p = params["params"]
        assert "input_quant" in p["blocks_0"]["mlp"]["fc1"]
        assert "input_quant" not in p["blocks_1"]["mlp"]["fc1"]
        # float attention uses a fused Dense qkv with no quantizers
        assert "input_quant" not in p["blocks_0"]["attn"]["qkv"]

    def test_qkr_model_grads_finite(self):
        pol = policy_from_args(
            wq_bitw=2, aq_bitw=2, qmodules=default_deit_qmodules(2),
            qk_reparam=True, qk_reparam_type=1)
        m = make(pol)
        x = x_batch()
        params = m.init({"params": jax.random.key(0)}, x)
        labels = jnp.asarray([1, 2])

        def loss(p):
            (cls, dist), _ = m.apply(
                p, x, train=True,
                rngs={"dropout": jax.random.key(1),
                      "droppath": jax.random.key(2)})
            lo = jax.nn.log_softmax(cls)
            return -jnp.mean(lo[jnp.arange(2), labels])

        val, g = jax.jit(jax.value_and_grad(loss))(params)
        gn = jnp.sqrt(sum(jnp.sum(v ** 2) for v in jax.tree.leaves(g)))
        assert bool(jnp.isfinite(val)) and bool(jnp.isfinite(gn))
        assert float(gn) > 0

    def test_full_lsq_path(self):
        pol = policy_from_args(
            wq_bitw=2, wq_mode="lsq", aq_bitw=2,
            qmodules=default_deit_qmodules(2))
        assert pol.lsq_weights
        m = make(pol)
        x = x_batch()
        params = m.init({"params": jax.random.key(0)}, x)
        # weights carry learned scales in the full-LSQ path
        assert "weight_quant" in params["params"]["blocks_0"]["attn"]["qkv"]

    def test_create_model_registry(self):
        m = create_model("deit_tiny_distilled_patch16_224")
        assert m.cfg.embed_dim == 192 and m.cfg.num_heads == 3
