"""CLI surface tests: two-stage YAML + flag overrides, policy assembly."""

import textwrap

import pytest

from ofq_tpu.cli.common import parse_args, policy_from_namespace


class TestParse:
    def test_yaml_defaults_and_cli_override(self, tmp_path):
        cfg = tmp_path / "c.yml"
        cfg.write_text(textwrap.dedent("""
            model: deit_small_distilled_patch16_224
            batch_size: 512
            lr: 2.0e-4
            wq_bitw: 3
            qmodules: ["blocks.0.attn", "head"]
        """))
        args = parse_args([
            "-c", str(cfg), "/data", "--batch-size", "64", "--wq-enable",
            "--aq-enable", "--aq-bitw", "3"])
        assert args.model == "deit_small_distilled_patch16_224"  # from YAML
        assert args.batch_size == 64                             # CLI wins
        assert args.lr == 2.0e-4
        assert args.wq_bitw == 3
        assert args.qmodules == ["blocks.0.attn", "head"]
        assert args.data_dir == "/data"

    def test_boundary_range_rename(self, tmp_path):
        args = parse_args(["--boundaryRange", "0.01"])
        assert args.boundary_range == 0.01

    def test_ignored_gpu_flags_accepted(self):
        args = parse_args(["--world_size", "8", "--visible_gpu", "0,1",
                           "--tcp_port", "1234"])
        assert args.world_size == "8"

    def test_reference_train_script_flags_parse(self):
        # the exact flag set of train_scripts/deit_s/w2a2_deit_s.sh
        argv = [
            "-c", "configs/deit_imagenet_qat.yml", "/data/imagenet",
            "--model", "deit_small_distilled_patch16_224",
            "--dataset", "torch/imagenet", "--epochs", "300",
            "--batch-size", "140", "--weight-decay", "0.05",
            "--warmup-lr", "1.0e-6", "--lr", "5.47e-4",
            "--warmup-epochs", "5", "--mixup", "0.0", "--cutmix", "0.0",
            "--aq-enable", "--aq-mode", "lsq", "--aq-per-channel",
            "--aq_clip_learnable", "--aq-bitw", "2", "--wq-enable",
            "--wq-per-channel", "--wq-bitw", "2", "--wq-mode", "statsq",
            "--model_type", "deit", "--quantized", "--pretrained",
            "--pretrained_initialized", "--use-kd",
            "--teacher", "deit_small_distilled_patch16_224",
            "--kd_hard_and_soft", "1", "--qk_reparam",
            "--qk_reparam_type", "0", "--teacher_pretrained",
            "--output", "./out", "--visible_gpu", "4,5,6,7",
            "--world_size", "4", "--tcp_port", "36969",
        ]
        args = parse_args(argv)
        assert args.qk_reparam and args.kd_hard_and_soft == 1
        pol = policy_from_namespace(args)
        assert pol.weight.bit == 2 and pol.act.bit == 2
        assert pol.weight.mode == "statsq" and pol.act.mode == "lsq"
        assert pol.qk_reparam
        assert "blocks.11.mlp" in pol.qmodules  # from the YAML qmodules

    def test_reference_yaml_files_parse_unchanged(self):
        # migration check: the reference's OWN config files (-c <ref yaml>)
        # drive our CLI directly — unknown GPU-era keys are dropped, the
        # qmodules policy list and data/aug/optimizer defaults carry over
        import glob
        import os

        ref_cfgs = sorted(glob.glob("/root/reference/configs/*.yml"))
        if not ref_cfgs:
            import pytest

            pytest.skip("reference tree not mounted")
        for cfg in ref_cfgs:
            args = parse_args([
                "-c", cfg, "--quantized", "--wq-enable", "--wq-bitw", "2",
                "--wq-mode", "statsq", "--aq-enable", "--aq-mode", "lsq",
                "--aq-bitw", "2"])
            pol = policy_from_namespace(args)
            assert pol.qmodules, cfg
            assert args.aa == "rand-m9-mstd0.5-inc1", cfg
            if "swin" in os.path.basename(cfg):
                assert any("features" in m for m in pol.qmodules), cfg
            else:
                assert "blocks.11.mlp" in pol.qmodules, cfg

    def test_fp_baseline_recipe_namespace(self):
        # configs/deit_imagenet_fp.yml must reproduce the reference FP
        # recipe's hyperparameters (deit_default_imagent.attn_q.yml) so the
        # phase-0 -> QAT -> CGA chain is runnable 1:1 from shipped files
        args = parse_args(["-c", "configs/deit_imagenet_fp.yml",
                           "/data/imagenet",
                           "--model", "deit_tiny_distilled_patch16_224"])
        assert args.epochs == 300 and args.cooldown_epochs == 10
        assert args.warmup_epochs == 5 and args.warmup_lr == 1.0e-5
        assert args.lr == 5e-4 and args.min_lr == 1e-5
        assert args.weight_decay == 0.05 and args.batch_size == 128
        assert args.mixup == 0.8 and args.cutmix == 1.0
        assert args.smoothing == 0.1 and args.num_aug_repeats == 3
        assert args.aa == "rand-m9-mstd0.5-inc1" and args.reprob == 0.25
        assert args.crop_pct == 0.9 and not args.model_ema and not args.amp
        # quantization OFF: the qmodules list is carried for surface
        # parity but the policy must be identity
        pol = policy_from_namespace(args)
        assert pol.is_float

    def test_unquantized_default_is_float(self):
        args = parse_args([])
        pol = policy_from_namespace(args)
        assert pol.is_float


class TestPolicyGating:
    def test_aq_disabled_means_no_act_quantizers(self):
        args = parse_args(["--quantized", "--wq-enable", "--wq-bitw", "2"])
        pol = policy_from_namespace(args)
        assert pol.act.bit == 32 and not pol.act.enabled
        # model built from this policy must not create activation quantizers
        import jax
        import jax.numpy as jnp

        from ofq_tpu.models import DeiTConfig, VisionTransformer

        cfg = DeiTConfig(img_size=32, patch_size=8, embed_dim=24, depth=1,
                         num_heads=3, num_classes=10)
        m = VisionTransformer(cfg=cfg, policy=pol)
        p = m.init({"params": jax.random.key(0)}, jnp.zeros((1, 32, 32, 3)))
        assert "input_quant" not in p["params"]["blocks_0"]["mlp"]["fc1"]
