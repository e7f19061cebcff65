"""Deployment export: packed integer weights must reproduce the trained
model's forward bit-near-exactly under the frozen-weight policy."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofq_tpu.deploy import (artifact_nbytes, export_packed, pack_codes,
                            restore_packed, unpack_codes)
from ofq_tpu.models import DeiTConfig, VisionTransformer
from ofq_tpu.quant import default_deit_qmodules, policy_from_args

TINY = DeiTConfig(img_size=32, patch_size=8, embed_dim=128, depth=2,
                  num_heads=2, num_classes=7)


class TestPacking:
    @pytest.mark.parametrize("bits", [2, 3, 4, 8])
    def test_roundtrip(self, bits):
        rng = np.random.default_rng(bits)
        codes = rng.integers(0, 2 ** bits, size=537).astype(np.uint8)
        packed = pack_codes(codes, bits)
        assert packed.nbytes <= 537 * bits / 8 + 1
        back = unpack_codes(packed, bits, 537)
        np.testing.assert_array_equal(back, codes)


class TestPackingGuards:
    @pytest.mark.parametrize("wq,aq", [(True, False), (False, True),
                                       (False, False)])
    def test_export_requires_both_quantizers(self, tmp_path, wq, aq):
        # aq-on/wq-off is the dangerous corner: QLinear kernels carry the
        # input_quant marker, so export would StatsQ-pack never-quantized
        # fp32 kernels at wq_bitw bits (silently wrong logits). The guard
        # fires before any checkpoint I/O.
        import yaml

        from ofq_tpu.serve import export_experiment

        exp = tmp_path / "exp"
        exp.mkdir()
        (exp / "args.yaml").write_text(yaml.safe_dump(
            {"wq_enable": wq, "aq_enable": aq, "wq_bitw": 2, "aq_bitw": 2}))
        with pytest.raises(NotImplementedError, match="BOTH"):
            export_experiment(str(exp), str(tmp_path / "out.npz"))

    def test_one_bit_export_rejected(self):
        # bits=1 maps w=-s to code -2 (round-half-to-even on -1.5), one
        # below the [-n, n-1] range: the uint8 cast would wrap to 255 and
        # silently corrupt the weight — must be rejected up front
        with pytest.raises(ValueError, match="2..8"):
            export_packed({"fc1": {"kernel": np.ones((4, 4), np.float32)}},
                          weight_bits=1, qk_reparam=False, num_heads=1)


class TestExportRestore:
    def _build(self, qk_reparam, bits=2):
        pol = policy_from_args(
            wq_bitw=bits, aq_bitw=bits,
            qmodules=default_deit_qmodules(2),
            qk_reparam=qk_reparam, qk_reparam_type=0)
        model = VisionTransformer(cfg=TINY, policy=pol)
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(4, 32, 32, 3)), jnp.float32)
        params = model.init({"params": jax.random.key(0)}, x)
        return pol, model, params, x

    @pytest.mark.parametrize("qk_reparam,bits", [(False, 2), (True, 2),
                                                 (True, 3), (False, 4)])
    def test_forward_parity_and_size(self, qk_reparam, bits):
        pol, model, params, x = self._build(qk_reparam, bits=bits)
        ref_logits, _ = model.apply(params, x, train=False)

        exported = export_packed(
            jax.tree.map(np.asarray, params["params"]),
            weight_bits=bits, qk_reparam=qk_reparam,
            num_heads=TINY.num_heads)
        restored = restore_packed(exported)

        frozen_pol = dataclasses.replace(pol, weight_frozen=True)
        frozen_model = VisionTransformer(cfg=TINY, policy=frozen_pol)
        got_logits, _ = frozen_model.apply(
            {"params": jax.tree.map(jnp.asarray, restored)}, x, train=False)
        np.testing.assert_allclose(got_logits, ref_logits,
                                   rtol=1e-4, atol=1e-4)

        fp32_bytes = sum(np.asarray(v).nbytes
                         for v in jax.tree.leaves(params["params"]))
        ratio = fp32_bytes / artifact_nbytes(exported)
        # W2 block kernels (the bulk) shrink 16x; fp32 passthroughs (norms,
        # biases, scales, embeddings) cap the whole-artifact ratio
        assert ratio > 3.0, ratio

    @pytest.mark.parametrize("qk_reparam", [False, True])
    def test_int_core_serving_parity(self, qk_reparam):
        """serve --int-core: the int8 integer-core frozen path must agree
        with the frozen-fp path (same codes by construction — the int
        path's accumulation is EXACT int32, so any difference is the fp
        path's own summation rounding) and preserve every prediction."""
        pol, model, params, x = self._build(qk_reparam)
        exported = export_packed(
            jax.tree.map(np.asarray, params["params"]),
            weight_bits=2, qk_reparam=qk_reparam, num_heads=TINY.num_heads)

        frozen_pol = dataclasses.replace(pol, weight_frozen=True)
        fp_model = VisionTransformer(cfg=TINY, policy=frozen_pol)
        fp_logits, _ = fp_model.apply(
            {"params": jax.tree.map(jnp.asarray, restore_packed(exported))},
            x, train=False)

        int_pol = dataclasses.replace(pol, weight_frozen=True,
                                      frozen_int_bits=2)
        int_model = VisionTransformer(cfg=TINY, policy=int_pol)
        restored = restore_packed(exported, int_core=True)
        int_logits, _ = int_model.apply(
            {"params": jax.tree.map(jnp.asarray, restored)}, x, train=False)
        np.testing.assert_allclose(int_logits, fp_logits,
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(np.argmax(int_logits, -1),
                                      np.argmax(fp_logits, -1))

    def test_frozen_tree_has_no_qk_kernels(self):
        _, _, params, _ = self._build(True)
        exported = export_packed(
            jax.tree.map(np.asarray, params["params"]),
            weight_bits=2, qk_reparam=True, num_heads=TINY.num_heads)
        restored = restore_packed(exported)
        attn = restored["blocks_0"]["attn"]
        assert "w_qk_frozen" in attn
        assert "q_kernel" not in attn and "k_kernel" not in attn

    def test_experiment_export_serve_roundtrip(self, tmp_path):
        """Train a tiny experiment, freeze it with export_experiment, and
        serve from the artifact: predictions must match the fp32-checkpoint
        predictor bit-exactly."""
        from ofq_tpu.cli.common import parse_args
        from ofq_tpu.cli.runner import Runner
        from ofq_tpu.serve import (Predictor, export_experiment,
                                   predictor_from_artifact)

        args = parse_args([
            "synthetic", "--model", "deit_test_distilled", "--img-size",
            "32", "--num-classes", "4", "--batch-size", "8", "--epochs",
            "1", "--cooldown-epochs", "0", "--steps-per-epoch", "2",
            "--quantized", "--wq-enable", "--wq-bitw", "2", "--aq-enable",
            "--aq-bitw", "2", "--aq_clip_learnable",
            "--output", str(tmp_path), "--experiment", "exp"])
        Runner(args).fit()
        exp = str(tmp_path / "exp")
        npz = str(tmp_path / "frozen.npz")
        export_experiment(exp, npz)

        x = np.random.default_rng(1).normal(
            size=(4, 32, 32, 3)).astype(np.float32)
        a = Predictor.from_experiment(exp, batch_size=4).predict(x)
        b = predictor_from_artifact(
            npz, exp + "/args.yaml", batch_size=4).predict(x)
        np.testing.assert_array_equal(a, b)

    def test_swin_qkr_export_parity(self):
        """Swin's per-stage C with d=32 heads must round-trip (head_dim
        drives the per-stage H inference in the W_qk export)."""
        from ofq_tpu.models.swin import SwinConfig, SwinTransformer
        from ofq_tpu.quant import default_swin_qmodules

        cfg = SwinConfig(img_size=32, patch_size=4, embed_dim=64,
                         depths=(1, 1), num_heads=(2, 4), window_size=4,
                         num_classes=5, drop_path_rate=0.0)
        pol = policy_from_args(
            wq_bitw=2, aq_bitw=2,
            qmodules=default_swin_qmodules((1, 1)),
            qk_reparam=True, qk_reparam_type=0)
        model = SwinTransformer(cfg=cfg, policy=pol)
        x = jnp.asarray(
            np.random.default_rng(2).normal(size=(2, 32, 32, 3)),
            jnp.float32)
        params = model.init({"params": jax.random.key(0)}, x)
        ref, _ = model.apply(params, x, train=False)

        exported = export_packed(
            jax.tree.map(np.asarray, params["params"]),
            weight_bits=2, qk_reparam=True, head_dim=32)
        restored = restore_packed(exported)
        frozen = SwinTransformer(
            cfg=cfg, policy=dataclasses.replace(pol, weight_frozen=True))
        got, _ = frozen.apply(
            {"params": jax.tree.map(jnp.asarray, restored)}, x, train=False)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("qk_reparam", [False, True])
    def test_swin_int_core_serving_parity(self, qk_reparam):
        """serve --int-core on Swin: BOTH attention variants must take the
        int8 frozen path (the non-QKR QSwinAttention gets frozen_int_bits
        through its qkv/proj QLinears) and agree with frozen-fp."""
        from ofq_tpu.models.swin import SwinConfig, SwinTransformer
        from ofq_tpu.quant import default_swin_qmodules

        cfg = SwinConfig(img_size=32, patch_size=4, embed_dim=64,
                         depths=(1, 1), num_heads=(2, 4), window_size=4,
                         num_classes=5, drop_path_rate=0.0)
        pol = policy_from_args(
            wq_bitw=2, aq_bitw=2,
            qmodules=default_swin_qmodules((1, 1)),
            qk_reparam=qk_reparam, qk_reparam_type=0)
        model = SwinTransformer(cfg=cfg, policy=pol)
        x = jnp.asarray(
            np.random.default_rng(5).normal(size=(2, 32, 32, 3)),
            jnp.float32)
        params = model.init({"params": jax.random.key(0)}, x)
        exported = export_packed(
            jax.tree.map(np.asarray, params["params"]),
            weight_bits=2, qk_reparam=qk_reparam, head_dim=32)

        fp = SwinTransformer(
            cfg=cfg, policy=dataclasses.replace(pol, weight_frozen=True))
        fp_logits, _ = fp.apply(
            {"params": jax.tree.map(jnp.asarray, restore_packed(exported))},
            x, train=False)
        im = SwinTransformer(
            cfg=cfg, policy=dataclasses.replace(pol, weight_frozen=True,
                                                frozen_int_bits=2))
        restored = restore_packed(exported, int_core=True)
        int_logits, _ = im.apply(
            {"params": jax.tree.map(jnp.asarray, restored)}, x, train=False)
        np.testing.assert_allclose(int_logits, fp_logits,
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(np.argmax(int_logits, -1),
                                      np.argmax(fp_logits, -1))

    def _build_lsq(self, bits=3, wq_asym=False):
        pol = policy_from_args(
            wq_bitw=bits, aq_bitw=bits, wq_mode="lsq", aq_mode="lsq",
            wq_learnable=True, wq_asym=wq_asym,
            qmodules=default_deit_qmodules(2))
        model = VisionTransformer(cfg=TINY, policy=pol)
        x = jnp.asarray(
            np.random.default_rng(1).normal(size=(4, 32, 32, 3)),
            jnp.float32)
        params = model.init({"params": jax.random.key(0)}, x)
        return pol, model, params, x

    @pytest.mark.parametrize("bits,wq_asym", [(2, False), (3, False),
                                              (3, True)])
    def test_full_lsq_export_restore_parity(self, bits, wq_asym):
        """--wq-mode lsq export: block kernels pack at wq_bitw with their
        LEARNED scale (signed, or unsigned under --wq_asym); the frozen
        model (weight_bits=32, kernel consumed directly) must reproduce
        the master model's logits."""
        pol, model, params, x = self._build_lsq(bits, wq_asym)
        ref_logits, _ = model.apply(params, x, train=False)

        exported = export_packed(
            jax.tree.map(np.asarray, params["params"]),
            weight_bits=bits, qk_reparam=False, num_heads=TINY.num_heads,
            wq_mode="lsq", wq_asym=wq_asym)
        restored = restore_packed(exported)

        frozen_pol = dataclasses.replace(pol, weight_frozen=True)
        frozen_model = VisionTransformer(cfg=TINY, policy=frozen_pol)
        got_logits, _ = frozen_model.apply(
            {"params": jax.tree.map(jnp.asarray, restored)}, x, train=False)
        np.testing.assert_allclose(got_logits, ref_logits,
                                   rtol=1e-4, atol=1e-4)
        # block kernels (the bulk) must actually be packed, not passthrough
        fp32_bytes = sum(np.asarray(v).nbytes
                         for v in jax.tree.leaves(params["params"]))
        assert fp32_bytes / artifact_nbytes(exported) > 2.0

    def test_full_lsq_tree_with_statsq_mode_rejected(self):
        """An LSQ param tree exported without wq_mode='lsq' would StatsQ-
        pack kernels whose trained quantizer used a learned scale —
        silently wrong values; must be rejected."""
        _, _, params, _ = self._build_lsq()
        with pytest.raises(ValueError, match="wq_mode"):
            export_packed(jax.tree.map(np.asarray, params["params"]),
                          weight_bits=3, qk_reparam=False,
                          num_heads=TINY.num_heads)

    @pytest.mark.parametrize("bits,wq_asym", [(2, False), (3, True)])
    def test_full_lsq_int_core_serving_parity(self, bits, wq_asym):
        """serve --int-core on a full-LSQ artifact: codes reconstruct from
        the restored weight_quant/s params (frozen_lsq_weight_int) and the
        int8 path must agree with the frozen-fp path up to the fp path's
        own summation rounding, preserving every prediction."""
        pol, model, params, x = self._build_lsq(bits, wq_asym)
        exported = export_packed(
            jax.tree.map(np.asarray, params["params"]),
            weight_bits=bits, qk_reparam=False, num_heads=TINY.num_heads,
            wq_mode="lsq", wq_asym=wq_asym)

        frozen_pol = dataclasses.replace(pol, weight_frozen=True)
        fp_model = VisionTransformer(cfg=TINY, policy=frozen_pol)
        fp_logits, _ = fp_model.apply(
            {"params": jax.tree.map(jnp.asarray, restore_packed(exported))},
            x, train=False)

        int_pol = dataclasses.replace(pol, weight_frozen=True,
                                      frozen_int_bits=bits)
        int_model = VisionTransformer(cfg=TINY, policy=int_pol)
        restored = restore_packed(exported, int_core=True)
        int_logits, _ = int_model.apply(
            {"params": jax.tree.map(jnp.asarray, restored)}, x, train=False)
        np.testing.assert_allclose(int_logits, fp_logits,
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(np.argmax(int_logits, -1),
                                      np.argmax(fp_logits, -1))

class TestArtifactMetaGuards:
    def test_artifact_args_bit_mismatch_rejected(self, tmp_path):
        """predictor_from_artifact must validate the artifact's recorded
        weight_bits against args.yaml: with a mismatched pair (wrong
        exp_dir next to the right npz) the int-core path would rebuild
        integer codes at the wrong n and silently serve garbage."""
        import yaml as _yaml

        from ofq_tpu.serve import predictor_from_artifact

        exported = export_packed(
            {"head": {"kernel": np.ones((8, 4), np.float32)}},
            weight_bits=2, qk_reparam=False, num_heads=1)
        npz = str(tmp_path / "w2.npz")
        np.savez(npz, **exported)
        ay = str(tmp_path / "args.yaml")
        with open(ay, "w") as f:
            _yaml.safe_dump({"wq_bitw": 4, "aq_bitw": 4}, f)
        with pytest.raises(ValueError, match="packed at W2"):
            predictor_from_artifact(npz, ay)

    def test_artifact_args_qkr_mismatch_rejected(self, tmp_path):
        import yaml as _yaml

        from ofq_tpu.serve import predictor_from_artifact

        exported = export_packed(
            {"head": {"kernel": np.ones((8, 4), np.float32)}},
            weight_bits=2, qk_reparam=True, num_heads=1)
        npz = str(tmp_path / "w2qkr.npz")
        np.savez(npz, **exported)
        ay = str(tmp_path / "args.yaml")
        with open(ay, "w") as f:
            _yaml.safe_dump({"wq_bitw": 2, "aq_bitw": 2,
                             "qk_reparam": False}, f)
        with pytest.raises(ValueError, match="qk_reparam"):
            predictor_from_artifact(npz, ay)

    def test_artifact_args_wq_mode_mismatch_rejected(self, tmp_path):
        """A full-LSQ artifact served with a statsq args.yaml (or vice
        versa) would rebuild the wrong model path — must be rejected."""
        import yaml as _yaml

        from ofq_tpu.serve import predictor_from_artifact

        exported = export_packed(
            {"head": {"kernel": np.ones((8, 4), np.float32)}},
            weight_bits=2, qk_reparam=False, num_heads=1, wq_mode="lsq")
        npz = str(tmp_path / "w2lsq.npz")
        np.savez(npz, **exported)
        ay = str(tmp_path / "args.yaml")
        with open(ay, "w") as f:
            _yaml.safe_dump({"wq_bitw": 2, "aq_bitw": 2}, f)
        with pytest.raises(ValueError, match="wq_mode"):
            predictor_from_artifact(npz, ay)

    def test_artifact_args_wq_asym_mismatch_rejected(self, tmp_path):
        """The asym/signed weight-code range changes decode AND the
        int-core eligibility window (unsigned W8 codes wrap int8) — an
        asym artifact paired with a signed-run args.yaml must be
        rejected, not silently decoded on the wrong range."""
        import yaml as _yaml

        from ofq_tpu.serve import predictor_from_artifact

        exported = export_packed(
            {"head": {"kernel": np.ones((8, 4), np.float32)}},
            weight_bits=2, qk_reparam=False, num_heads=1, wq_mode="lsq",
            wq_asym=True)
        npz = str(tmp_path / "w2asym.npz")
        np.savez(npz, **exported)
        ay = str(tmp_path / "args.yaml")
        with open(ay, "w") as f:
            _yaml.safe_dump({"wq_bitw": 2, "aq_bitw": 2,
                             "wq_mode": "lsq", "aq_mode": "lsq"}, f)
        with pytest.raises(ValueError, match="wq_asym"):
            predictor_from_artifact(npz, ay)

    def test_int_core_lsq_qkr_rejected(self, tmp_path):
        """lsq + --qk_reparam is not a reference configuration and the QKR
        frozen attention reconstructs StatsQ products only — reject rather
        than silently serving fp rates under an int-core label."""
        import yaml as _yaml

        from ofq_tpu.serve import predictor_from_artifact

        exported = export_packed(
            {"head": {"kernel": np.ones((8, 4), np.float32)}},
            weight_bits=2, qk_reparam=True, num_heads=1, wq_mode="lsq")
        npz = str(tmp_path / "w2lsq.npz")
        np.savez(npz, **exported)
        ay = str(tmp_path / "args.yaml")
        with open(ay, "w") as f:
            _yaml.safe_dump({"wq_bitw": 2, "aq_bitw": 2, "qk_reparam": True,
                             "wq_mode": "lsq", "aq_mode": "lsq"}, f)
        with pytest.raises(ValueError, match="qk_reparam"):
            predictor_from_artifact(npz, ay, int_core=True)
        # asym W8 codes overflow int8 — also rejected, not silent-fp
        exported8 = export_packed(
            {"head": {"kernel": np.ones((8, 4), np.float32)}},
            weight_bits=8, qk_reparam=False, num_heads=1, wq_mode="lsq",
            wq_asym=True)
        npz8 = str(tmp_path / "w8lsq.npz")
        np.savez(npz8, **exported8)
        with open(ay, "w") as f:
            _yaml.safe_dump({"wq_bitw": 8, "aq_bitw": 2, "wq_asym": True,
                             "wq_mode": "lsq", "aq_mode": "lsq"}, f)
        with pytest.raises(ValueError, match="full-LSQ supports"):
            predictor_from_artifact(npz8, ay, int_core=True)
