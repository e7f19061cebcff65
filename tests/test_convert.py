"""Checkpoint-converter tests against synthetic reference-named state dicts.

We cannot download the released checkpoints (zero-egress box), so these
tests build state dicts with the exact reference naming/shape conventions
(torch (out,in) linears, OIHW convs, fused qkv, quantizer buffers) and
verify the converted tree loads into our models and computes consistently.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofq_tpu.convert import (
    convert_deit,
    convert_swin,
    merge_pretrained,
    split_qkv_for_qkr,
)
from ofq_tpu.models import DeiTConfig, VisionTransformer
from ofq_tpu.quant import default_deit_qmodules, policy_from_args

CFG = DeiTConfig(img_size=32, patch_size=8, embed_dim=24, depth=2,
                 num_heads=3, num_classes=10)


def fake_fp_deit_sd(cfg: DeiTConfig, rng) -> dict:
    """Reference-named FP DeiT state dict (timm naming)."""
    C = cfg.embed_dim
    g = cfg.img_size // cfg.patch_size
    sd = {
        "cls_token": rng.normal(size=(1, 1, C)),
        "dist_token": rng.normal(size=(1, 1, C)),
        "pos_embed": rng.normal(size=(1, g * g + 2, C)),
        "patch_embed.proj.weight": rng.normal(
            size=(C, 3, cfg.patch_size, cfg.patch_size)),
        "patch_embed.proj.bias": rng.normal(size=(C,)),
        "norm.weight": rng.normal(size=(C,)),
        "norm.bias": rng.normal(size=(C,)),
        "head.weight": rng.normal(size=(cfg.num_classes, C)),
        "head.bias": rng.normal(size=(cfg.num_classes,)),
        "head_dist.weight": rng.normal(size=(cfg.num_classes, C)),
        "head_dist.bias": rng.normal(size=(cfg.num_classes,)),
    }
    for i in range(cfg.depth):
        p = f"blocks.{i}"
        sd |= {
            f"{p}.norm1.weight": rng.normal(size=(C,)),
            f"{p}.norm1.bias": rng.normal(size=(C,)),
            f"{p}.norm2.weight": rng.normal(size=(C,)),
            f"{p}.norm2.bias": rng.normal(size=(C,)),
            f"{p}.attn.qkv.weight": rng.normal(size=(3 * C, C)),
            f"{p}.attn.qkv.bias": rng.normal(size=(3 * C,)),
            f"{p}.attn.proj.weight": rng.normal(size=(C, C)),
            f"{p}.attn.proj.bias": rng.normal(size=(C,)),
            f"{p}.mlp.fc1.weight": rng.normal(size=(4 * C, C)),
            f"{p}.mlp.fc1.bias": rng.normal(size=(4 * C,)),
            f"{p}.mlp.fc2.weight": rng.normal(size=(C, 4 * C)),
            f"{p}.mlp.fc2.bias": rng.normal(size=(C,)),
        }
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


class TestDeiTConvert:
    def test_fp_roundtrip_into_float_model(self):
        rng = np.random.default_rng(0)
        sd = fake_fp_deit_sd(CFG, rng)
        tree = convert_deit(sd, depth=CFG.depth, img_size=CFG.img_size)
        model = VisionTransformer(cfg=CFG)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
        init = model.init({"params": jax.random.key(0)}, x)
        merged = merge_pretrained(init["params"], tree)
        # every loaded leaf must have replaced the init (spot check)
        np.testing.assert_allclose(
            merged["blocks_0"]["attn"]["qkv"]["kernel"],
            sd["blocks.0.attn.qkv.weight"].T)
        np.testing.assert_allclose(
            merged["patch_embed"]["kernel"],
            sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0))
        logits, _ = model.apply(
            {"params": jax.tree.map(jnp.asarray, merged)}, x, train=False)
        assert bool(jnp.isfinite(logits).all())

    def test_qkv_split_for_qkr(self):
        rng = np.random.default_rng(1)
        sd = fake_fp_deit_sd(CFG, rng)
        tree = convert_deit(sd, depth=CFG.depth)
        tree = split_qkv_for_qkr(tree)
        C = CFG.embed_dim
        attn = tree["blocks_0"]["attn"]
        assert "qkv" not in attn
        # torch thirds: rows [0:C] are q -> our q_kernel is (in, out) so the
        # transpose's first C columns
        w = sd["blocks.0.attn.qkv.weight"]
        np.testing.assert_allclose(attn["q_kernel"], w[:C].T)
        np.testing.assert_allclose(attn["k_kernel"], w[C:2 * C].T)
        np.testing.assert_allclose(attn["v_kernel"], w[2 * C:].T)
        np.testing.assert_allclose(attn["v_bias"],
                                   sd["blocks.0.attn.qkv.bias"][2 * C:])
        # loads into a QKR-quantized model
        pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                               qmodules=default_deit_qmodules(CFG.depth),
                               qk_reparam=True)
        model = VisionTransformer(cfg=CFG, policy=pol)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
        init = model.init({"params": jax.random.key(0)}, x)
        merged = merge_pretrained(init["params"], tree)
        np.testing.assert_allclose(
            merged["blocks_0"]["attn"]["q_kernel"], w[:C].T)
        logits, _ = model.apply(
            {"params": jax.tree.map(jnp.asarray, merged)}, x, train=False)
        assert bool(jnp.isfinite(logits).all())

    def test_quantized_checkpoint_state(self):
        """OFQ checkpoints carry LSQ scales + LearnableBias; they must land
        on our quantizer params."""
        rng = np.random.default_rng(2)
        sd = fake_fp_deit_sd(CFG, rng)
        C = CFG.embed_dim
        N = (CFG.img_size // CFG.patch_size) ** 2 + 2
        sd |= {
            "blocks.0.attn.qkv.move_b4.bias": rng.normal(size=(C,)),
            "blocks.0.attn.qkv.move_aft.bias": rng.normal(size=(C,)),
            "blocks.0.attn.qkv.input_quant_fn.s": np.abs(rng.normal(size=(N,))),
            "blocks.0.attn.move_qkv_b4.bias": rng.normal(size=(3 * C,)),
            "blocks.0.attn.quan_a_q_fn.s": np.abs(rng.normal(size=(N,))),
            "blocks.0.attn.quan_a_softmax_fn.s": np.abs(rng.normal(size=(N,))),
            "patch_embed.proj.lsqw_fn.s": np.abs(rng.normal(size=(C,))),
            "patch_embed.proj.input_quant_fn.s": np.abs(rng.normal(size=(3,))),
            "patch_embed.proj.move_b4.bias": rng.normal(
                size=(CFG.img_size * CFG.img_size,)),
            "head.lsqw_fn.s": np.abs(rng.normal(size=(CFG.num_classes,))),
            "head.input_quant_fn.s": np.abs(rng.normal(size=(1,))),
        }
        sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
        tree = convert_deit(sd, depth=CFG.depth, img_size=CFG.img_size)
        pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                               qmodules=default_deit_qmodules(CFG.depth))
        model = VisionTransformer(cfg=CFG, policy=pol)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
        init = model.init({"params": jax.random.key(0)}, x)
        merged = merge_pretrained(init["params"], tree)
        np.testing.assert_allclose(
            merged["blocks_0"]["attn"]["qkv"]["input_quant"]["s"],
            sd["blocks.0.attn.qkv.input_quant_fn.s"])
        np.testing.assert_allclose(
            merged["patch_embed"]["move_b4"]["bias"],
            sd["patch_embed.proj.move_b4.bias"].reshape(32, 32))
        np.testing.assert_allclose(
            merged["head"]["weight_quant"]["s"], sd["head.lsqw_fn.s"])

    def test_quantized_image_bias_resamples_at_non_native_img_size(self):
        """Regression: a quantized checkpoint whose patch-embed ImageBias was
        stored at the checkpoint's own resolution must resample (bilinear)
        when imported at a different img_size (reference hardcodes 224*224,
        qlinear.py:163). Round-4 bug: this path raised NameError."""
        rng = np.random.default_rng(7)
        sd = fake_fp_deit_sd(CFG, rng)
        stored = rng.normal(size=(CFG.img_size * CFG.img_size,))
        sd["patch_embed.proj.move_b4.bias"] = stored
        sd["patch_embed.proj.move_aft.bias"] = rng.normal(
            size=(CFG.img_size * CFG.img_size,))
        sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
        new_size = CFG.img_size + 8  # 40: forces the resample branch
        tree = convert_deit(sd, depth=CFG.depth, img_size=new_size)
        b = tree["patch_embed"]["move_b4"]["bias"]
        assert b.shape == (new_size, new_size)
        assert np.isfinite(b).all()
        # bilinear resample preserves the overall level of the bias field
        assert abs(float(b.mean()) - float(stored.mean())) < 0.2
        assert tree["patch_embed"]["move_aft"]["bias"].shape == (
            new_size, new_size)


def fake_fp_swin_sd(cfg, rng):
    """torchvision-shaped FP Swin state dict for the tiny 2-stage config."""
    C = cfg.embed_dim
    sd = {
        "features.0.0.weight": rng.normal(size=(C, 3, 4, 4)),
        "features.0.0.bias": rng.normal(size=(C,)),
        "features.0.2.weight": rng.normal(size=(C,)),
        "features.0.2.bias": rng.normal(size=(C,)),
        "norm.weight": rng.normal(size=(2 * C,)),
        "norm.bias": rng.normal(size=(2 * C,)),
        "head.weight": rng.normal(size=(10, 2 * C)),
        "head.bias": rng.normal(size=(10,)),
        "features.2.norm.weight": rng.normal(size=(4 * C,)),
        "features.2.norm.bias": rng.normal(size=(4 * C,)),
        "features.2.reduction.weight": rng.normal(size=(2 * C, 4 * C)),
    }
    for fi, dim, heads in ((1, C, 2), (3, 2 * C, 4)):
        p = f"features.{fi}.0"
        n = (2 * cfg.window_size - 1) ** 2
        sd |= {
            f"{p}.norm1.weight": rng.normal(size=(dim,)),
            f"{p}.norm1.bias": rng.normal(size=(dim,)),
            f"{p}.norm2.weight": rng.normal(size=(dim,)),
            f"{p}.norm2.bias": rng.normal(size=(dim,)),
            f"{p}.attn.qkv.weight": rng.normal(size=(3 * dim, dim)),
            f"{p}.attn.qkv.bias": rng.normal(size=(3 * dim,)),
            f"{p}.attn.proj.weight": rng.normal(size=(dim, dim)),
            f"{p}.attn.proj.bias": rng.normal(size=(dim,)),
            f"{p}.attn.relative_position_bias_table":
                rng.normal(size=(n, heads)),
            f"{p}.mlp.0.weight": rng.normal(size=(4 * dim, dim)),
            f"{p}.mlp.0.bias": rng.normal(size=(4 * dim,)),
            f"{p}.mlp.3.weight": rng.normal(size=(dim, 4 * dim)),
            f"{p}.mlp.3.bias": rng.normal(size=(dim,)),
        }
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def _tiny_swin_cfg():
    from ofq_tpu.models.swin import SwinConfig

    return SwinConfig(img_size=32, patch_size=4, embed_dim=12,
                      depths=(1, 1), num_heads=(2, 4), window_size=4,
                      num_classes=10)


class TestSwinConvert:
    def test_fp_swin_roundtrip(self):
        from ofq_tpu.models.swin import SwinTransformer

        cfg = _tiny_swin_cfg()
        rng = np.random.default_rng(3)
        sd = fake_fp_swin_sd(cfg, rng)
        tree = convert_swin(sd, depths=cfg.depths, img_size=cfg.img_size)
        model = SwinTransformer(cfg=cfg)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
        init = model.init({"params": jax.random.key(0)}, x)
        merged = merge_pretrained(init["params"], tree)
        np.testing.assert_allclose(
            merged["features_1_0"]["attn"]["qkv"]["kernel"],
            sd["features.1.0.attn.qkv.weight"].T)
        np.testing.assert_allclose(
            merged["features_2"]["reduction"]["kernel"],
            sd["features.2.reduction.weight"].T)
        logits, _ = model.apply(
            {"params": jax.tree.map(jnp.asarray, merged)}, x, train=False)
        assert bool(jnp.isfinite(logits).all())

    def test_swin_qkv_split_for_qkr(self):
        """Swin QKR warm start (round-3 review finding): the structural
        split must reach `features_f_b/attn` modules — the old
        depth-indexed walk only covered DeiT's `blocks_i`, so every Swin
        attention projection silently trained from random init under
        --qk_reparam --initial-checkpoint."""
        from ofq_tpu.models.swin import SwinTransformer
        from ofq_tpu.quant import default_swin_qmodules

        cfg = _tiny_swin_cfg()
        rng = np.random.default_rng(4)
        sd = fake_fp_swin_sd(cfg, rng)
        tree = convert_swin(sd, depths=cfg.depths, img_size=cfg.img_size)
        tree = split_qkv_for_qkr(tree)
        dim = cfg.embed_dim
        attn = tree["features_1_0"]["attn"]
        assert "qkv" not in attn
        w = sd["features.1.0.attn.qkv.weight"]  # torch (3C, C)
        np.testing.assert_allclose(attn["q_kernel"], w[:dim].T)
        np.testing.assert_allclose(attn["k_kernel"], w[dim:2 * dim].T)
        np.testing.assert_allclose(attn["v_kernel"], w[2 * dim:].T)
        np.testing.assert_allclose(
            attn["v_bias"], sd["features.1.0.attn.qkv.bias"][2 * dim:])

        # and it must actually LAND in a QKR-quantized Swin student —
        # merge_pretrained silently skips mismatched keys, which is how
        # the bug hid
        pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                               qmodules=default_swin_qmodules(),
                               qk_reparam=True)
        model = SwinTransformer(cfg=cfg, policy=pol)
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
        init = model.init({"params": jax.random.key(0)}, x)
        merged = merge_pretrained(init["params"], tree)
        np.testing.assert_allclose(
            merged["features_1_0"]["attn"]["q_kernel"], w[:dim].T)
        np.testing.assert_allclose(
            merged["features_3_0"]["attn"]["v_kernel"],
            sd["features.3.0.attn.qkv.weight"][4 * dim:].T)
        logits, _ = model.apply(
            {"params": jax.tree.map(jnp.asarray, merged)}, x, train=False)
        assert bool(jnp.isfinite(logits).all())


class TestBnStatsConvert:
    def test_deit_and_swin_naming(self):
        """convert_bn_stats maps torch running-stat keys onto the flax
        batch_stats naming for both families; num_batches_tracked is
        dropped (fixed-momentum BN never reads it)."""
        from ofq_tpu.convert import convert_bn_stats

        sd = {
            "blocks.0.norm1.running_mean": np.zeros(8),
            "blocks.0.norm1.running_var": np.ones(8),
            "blocks.0.norm1.num_batches_tracked": np.asarray(3),
            "norm.running_mean": np.full(4, 2.0),
            "features.1.0.norm2.running_mean": np.full(6, 5.0),
            "features.2.norm.running_var": np.full(12, 7.0),
            "features.0.2.running_mean": np.zeros(2),  # swin patch LN site
            "blocks.0.norm1.weight": np.ones(8),       # params: ignored
        }
        t = convert_bn_stats(sd)
        assert t["blocks_0"]["norm1"]["mean"].shape == (8,)
        assert "num_batches_tracked" not in str(t)
        np.testing.assert_array_equal(t["norm"]["mean"], 2.0)
        np.testing.assert_array_equal(
            t["features_1_0"]["norm2"]["mean"], 5.0)
        np.testing.assert_array_equal(t["features_2"]["norm"]["var"], 7.0)
        # torchvision Swin patch-embed LN site -> our 'patch_norm'
        assert t["patch_norm"]["mean"].shape == (2,)
        assert "weight" not in t.get("blocks_0", {}).get("norm1", {})

    def test_empty_for_ln_checkpoints(self):
        from ofq_tpu.convert import convert_bn_stats

        assert convert_bn_stats({"blocks.0.norm1.weight": np.ones(4)}) == {}
