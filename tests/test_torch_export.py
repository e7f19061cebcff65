"""Torch EXPORT parity: ofq_tpu trees -> reference-loadable state_dicts.

The reverse of tests/test_torch_differential.py: train-side trees built
HERE are exported with convert.torch_export and loaded into the ACTUAL
reference torch modules (tests/reference_loader), then both sides run the
same input.  Three guarantees per flavor:

  1. the exported key set satisfies a STRICT torch load (every key the
     reference persists is emitted; nothing extra) — for Swin, strict
     minus the construction-rebuilt relative_position_index buffers,
  2. export -> convert_* round-trips bit-exactly back onto our tree,
  3. logits match the reference forward on perturbed params (so an
     unmapped key cannot hide behind equal inits).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import reference_loader as rl
from ofq_tpu.convert import (
    convert_deit,
    convert_swin,
    export_deit,
    export_swin,
    load_torch_state_dict,
    save_pth_tar,
)
from ofq_tpu.models import DeiTConfig, VisionTransformer
from ofq_tpu.quant import default_deit_qmodules, policy_from_args

DEPTH, DIM, HEADS, CLASSES = 2, 24, 3, 10


def _x(seed=0, n=2):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(n, 3, 224, 224, generator=g)


def _perturb_ours(params, seed=7):
    """Perturb every float leaf of OUR tree (keeping quantizer scales
    positive) so an unexported key cannot hide behind the reference
    keeping an identical calibration value."""
    rng = np.random.RandomState(seed)

    def walk(node):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            else:
                arr = np.asarray(v, np.float32)
                noise = 0.02 * rng.randn(*arr.shape).astype(np.float32)
                arr = arr + noise
                if k == "s":  # LSQ scales must stay positive
                    arr = np.abs(arr) + 1e-3
                out[k] = arr
        return out

    return walk(params)


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flat(v, p))
        else:
            out[p] = np.asarray(v)
    return out


def _assert_roundtrip(exported_sd, params, convert_fn, **kw):
    back = convert_fn(exported_sd, **kw)
    ours, theirs = _flat(params), _flat(back)
    assert set(theirs) == set(ours), (
        sorted(set(ours) ^ set(theirs))[:8])
    for k in ours:
        np.testing.assert_array_equal(
            np.asarray(ours[k], np.float32).reshape(theirs[k].shape),
            theirs[k], err_msg=k)


def _assert_quantized_close(ours, theirs):
    """Same flip-tolerant comparison as test_torch_differential: low-bit
    nets amplify one rounding flip to ~1e-3 logit shifts; a key-mapping
    bug shifts everything systematically."""
    diff = np.abs(ours - theirs)
    assert np.median(diff) < 1e-5, f"median {np.median(diff)} — systematic"
    assert diff.max() < 2e-2, f"max {diff.max()} — beyond flip scale"


def _our_deit(policy, x_t, perturb=True):
    cfg = DeiTConfig(img_size=224, patch_size=16, embed_dim=DIM,
                     depth=DEPTH, num_heads=HEADS, num_classes=CLASSES)
    model = VisionTransformer(cfg=cfg, policy=policy)
    x = jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 3, 1)))
    variables = jax.jit(
        lambda k, xx: model.init({"params": k}, xx, train=False)
    )(jax.random.key(0), x)
    params = _perturb_ours(variables["params"]) if perturb \
        else jax.tree.map(np.asarray, variables["params"])
    variables = {**variables, "params": jax.tree.map(jnp.asarray, params)}
    ours = np.asarray(jax.jit(
        lambda v, xx: model.apply(v, xx, train=False)[0])(variables, x))
    return params, variables.get("quant_stats"), ours


def _load_reference(torch_model, sd_np, *, strict=True, missing_ok=()):
    sd_t = {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in sd_np.items()}
    result = torch_model.load_state_dict(sd_t, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys[:8]
    missing = [k for k in result.missing_keys
               if not any(tag in k for tag in missing_ok)]
    assert not missing, (strict, missing[:8])
    return torch_model


def _ref_forward(torch_model, x_t):
    torch_model.eval()
    with torch.no_grad():
        out = torch_model(x_t)
    if isinstance(out, tuple):
        out = out[0]
    return out.numpy()


class TestDeiTExport:
    def test_fp_distilled(self):
        x_t = _x()
        params, qs, ours = _our_deit(policy_from_args(qmodules=()), x_t)
        sd = export_deit(params, quant_stats=qs)
        _assert_roundtrip(sd, params, convert_deit, depth=DEPTH,
                          img_size=224)
        torch.manual_seed(0)
        ref = rl.build_reference_deit(depth=DEPTH, embed_dim=DIM,
                                      num_heads=HEADS, num_classes=CLASSES)
        _load_reference(ref, sd)
        np.testing.assert_allclose(ours, _ref_forward(ref, x_t),
                                   atol=1e-4, rtol=1e-4)

    def _quantized_pair(self, x_t, *, qk_reparam, wq_mode="statsq"):
        qm = default_deit_qmodules(DEPTH, distilled=True)
        pol = policy_from_args(wq_bitw=2, aq_bitw=2, qmodules=qm,
                               qk_reparam=qk_reparam, wq_mode=wq_mode)
        params, qs, ours = _our_deit(pol, x_t)
        sd = export_deit(params, quant_stats=qs)
        _assert_roundtrip(
            {k: v for k, v in sd.items()
             if "clip_val" not in k and ".signed" not in k},
            params, convert_deit, depth=DEPTH, img_size=224)
        torch.manual_seed(0)
        ref = rl.build_reference_deit(depth=DEPTH, embed_dim=DIM,
                                      num_heads=HEADS, num_classes=CLASSES)
        ref = rl.quantize_reference(
            ref, model_type="deit", wq_bitw=2, aq_bitw=2, qmodules=qm,
            qk_reparam=qk_reparam, wq_mode=wq_mode)
        rl.setup_alpha(ref, _x(seed=99, n=1))  # materialize lazy scales
        _load_reference(ref, sd)
        return ours, _ref_forward(ref, x_t)

    def test_qat_statsq_lsq_strict(self):
        ours, theirs = self._quantized_pair(_x(), qk_reparam=False)
        _assert_quantized_close(ours, theirs)

    def test_qkr_strict(self):
        ours, theirs = self._quantized_pair(_x(seed=3), qk_reparam=True)
        _assert_quantized_close(ours, theirs)

    def test_full_lsq_strict(self):
        """--wq-mode lsq layouts (lsqw_fn.s on every block linear instead
        of statsq_fn.clip_val) export strict-loadable too."""
        ours, theirs = self._quantized_pair(_x(seed=4), qk_reparam=False,
                                            wq_mode="lsq")
        _assert_quantized_close(ours, theirs)

    def test_pth_tar_roundtrip(self, tmp_path):
        """save_pth_tar writes the CheckpointSaver layout our own
        importer (and the reference's --resume) can read back."""
        x_t = _x(seed=5)
        qm = default_deit_qmodules(DEPTH, distilled=True)
        pol = policy_from_args(wq_bitw=2, aq_bitw=2, qmodules=qm,
                               qk_reparam=True)
        params, qs, _ = _our_deit(pol, x_t)
        sd = export_deit(params, quant_stats=qs)
        path = str(tmp_path / "export.pth.tar")
        save_pth_tar(sd, path, arch="deit_tiny_distilled_patch16_224")
        loaded = load_torch_state_dict(path)
        assert set(loaded) == set(sd)
        for k in sd:
            np.testing.assert_array_equal(loaded[k], sd[k], err_msg=k)


ROUNDTRIP_CASES = {
    "fp_plain": dict(distilled=False, policy=dict(qmodules=())),
    "statsq_w2a2": dict(policy=dict(wq_bitw=2, aq_bitw=2)),
    "statsq_qkr_w3a3": dict(policy=dict(wq_bitw=3, aq_bitw=3,
                                        qk_reparam=True)),
    "statsq_plain_model": dict(distilled=False,
                               policy=dict(wq_bitw=2, aq_bitw=2)),
    "lsq_w3": dict(policy=dict(wq_bitw=3, aq_bitw=3, wq_mode="lsq")),
    "lsq_asym_w3": dict(policy=dict(wq_bitw=3, aq_bitw=3, wq_mode="lsq",
                                    wq_asym=True)),
    "wq_only": dict(policy=dict(wq_bitw=2, aq_enable=False)),
    "aq_only": dict(policy=dict(wq_enable=False, aq_bitw=2)),
    "prelu": dict(policy=dict(wq_bitw=2, aq_bitw=2, act_layer="prelu")),
}


class TestRoundtripMatrix:
    """export -> import must be a bit-exact bijection onto our tree for
    every policy shape the CLI can produce (locks the converter pair
    against drift without needing the torch side per case)."""

    @pytest.mark.parametrize("name", sorted(ROUNDTRIP_CASES))
    def test_roundtrip(self, name):
        case = ROUNDTRIP_CASES[name]
        pol_kw = dict(case["policy"])
        if "qmodules" not in pol_kw:
            pol_kw["qmodules"] = default_deit_qmodules(
                DEPTH, distilled=case.get("distilled", True))
        pol = policy_from_args(**pol_kw)
        cfg = DeiTConfig(img_size=32, patch_size=16, embed_dim=DIM,
                         depth=DEPTH, num_heads=HEADS, num_classes=CLASSES,
                         distilled=case.get("distilled", True))
        model = VisionTransformer(cfg=cfg, policy=pol)
        x = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 3),
                        jnp.float32)
        variables = jax.jit(
            lambda k, xx: model.init({"params": k}, xx, train=False)
        )(jax.random.key(0), x)
        params = jax.tree.map(np.asarray, variables["params"])
        sd = export_deit(params, quant_stats=variables.get("quant_stats"))
        back = convert_deit(
            {k: v for k, v in sd.items()
             if "clip_val" not in k and not k.endswith(".signed")},
            depth=DEPTH, img_size=32)
        ours, theirs = _flat(params), _flat(back)
        assert set(theirs) == set(ours), sorted(set(ours) ^ set(theirs))[:8]
        for k in ours:
            np.testing.assert_array_equal(
                np.asarray(ours[k], np.float32).reshape(theirs[k].shape),
                theirs[k], err_msg=k)


class TestActExport:
    def test_prelu_roundtrip(self):
        """--act-layer prelu: the learned slope exports as the torch
        nn.PReLU 'act.weight' key and re-imports onto mlp/act/alpha."""
        qm = default_deit_qmodules(DEPTH, distilled=True)
        pol = policy_from_args(wq_bitw=2, aq_bitw=2, qmodules=qm,
                               act_layer="prelu")
        cfg = DeiTConfig(img_size=32, patch_size=16, embed_dim=DIM,
                         depth=DEPTH, num_heads=HEADS, num_classes=CLASSES)
        model = VisionTransformer(cfg=cfg, policy=pol)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3),
                        jnp.float32)
        variables = jax.jit(
            lambda k, xx: model.init({"params": k}, xx, train=False)
        )(jax.random.key(0), x)
        params = jax.tree.map(np.asarray, variables["params"])
        assert "act" in params["blocks_0"]["mlp"]
        sd = export_deit(params, quant_stats=variables.get("quant_stats"))
        assert "blocks.0.mlp.act.weight" in sd
        back = convert_deit(sd, depth=DEPTH, img_size=32)
        np.testing.assert_array_equal(
            back["blocks_0"]["mlp"]["act"]["alpha"],
            params["blocks_0"]["mlp"]["act"]["alpha"])

    def test_batchnorm_export_strict_and_parity(self):
        """--replace-ln-by-bn export (round-5: previously refused): the
        BN running statistics emit as the reference BatchNorm buffers
        (running_mean/running_var/num_batches_tracked), strict-load into
        the reference's replace_ln_by_bn1d model, and eval-mode logits —
        which CONSUME the running stats — match.  Stats are perturbed
        independently of the affine params so a dropped buffer cannot
        hide behind 0/1 defaults."""
        from ofq_tpu.convert import convert_bn_stats

        x_t = _x(seed=11)
        qm = default_deit_qmodules(DEPTH, distilled=True)
        pol = policy_from_args(wq_bitw=2, aq_bitw=2, qmodules=qm,
                               qk_reparam=True)
        cfg = DeiTConfig(img_size=224, patch_size=16, embed_dim=DIM,
                         depth=DEPTH, num_heads=HEADS, num_classes=CLASSES,
                         norm_layer="batchnorm")
        model = VisionTransformer(cfg=cfg, policy=pol)
        x = jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 3, 1)))
        variables = jax.jit(
            lambda k, xx: model.init({"params": k}, xx, train=False)
        )(jax.random.key(0), x)
        params = _perturb_ours(variables["params"])
        rng = np.random.RandomState(3)
        bstats = jax.tree.map(
            lambda v: np.abs(np.asarray(v, np.float32)
                             + rng.normal(0, 0.3, np.shape(v))
                             .astype(np.float32)) + 0.05,
            jax.tree.map(np.asarray, variables["batch_stats"]))
        variables = {**variables,
                     "params": jax.tree.map(jnp.asarray, params),
                     "batch_stats": jax.tree.map(jnp.asarray, bstats)}
        ours = np.asarray(jax.jit(
            lambda v, xx: model.apply(v, xx, train=False)[0])(variables, x))

        sd = export_deit(params, quant_stats=variables.get("quant_stats"),
                         batch_stats=bstats)
        assert "blocks.0.norm1.running_var" in sd
        # round-trip: stats come back bit-exact through convert_bn_stats
        back = convert_bn_stats(sd)
        for k, a in _flat(bstats).items():
            np.testing.assert_array_equal(a, _flat(back)[k], err_msg=k)

        torch.manual_seed(0)
        ref = rl.build_reference_deit(depth=DEPTH, embed_dim=DIM,
                                      num_heads=HEADS, num_classes=CLASSES)
        ref = rl.quantize_reference(
            ref, model_type="deit", wq_bitw=2, aq_bitw=2, qmodules=qm,
            qk_reparam=True)
        from src.utils.utils import replace_ln_by_bn1d

        ref = replace_ln_by_bn1d(ref)
        rl.setup_alpha(ref, _x(seed=99, n=1))
        _load_reference(ref, sd)
        _assert_quantized_close(ours, _ref_forward(ref, x_t))

    def test_rprelu_rejected(self):
        """rprelu has no reference checkpoint layout (the reference's
        rprelu path never constructs its submodules) — export must refuse
        rather than silently drop learned params."""
        from ofq_tpu.convert.torch_export import _mlp_act

        with pytest.raises(NotImplementedError, match="rprelu"):
            _mlp_act({"act": {"move1": np.zeros(4), "alpha": np.ones(4),
                              "move2": np.zeros(4)}}, "blocks.0.mlp", {})


class TestExperimentExport:
    def test_cli_export_experiment(self, tmp_path):
        """Train a tiny experiment and export it via the CLI entry: the
        .pth.tar must re-import bit-exactly onto the trained params."""
        from ofq_tpu.cli.common import parse_args
        from ofq_tpu.cli.runner import Runner
        from ofq_tpu.convert.torch_export import main as export_main
        from ofq_tpu.serve import Predictor

        args = parse_args([
            "synthetic", "--model", "deit_test_distilled", "--img-size",
            "32", "--num-classes", "4", "--batch-size", "8", "--epochs",
            "1", "--cooldown-epochs", "0", "--steps-per-epoch", "2",
            "--quantized", "--wq-enable", "--wq-bitw", "2", "--aq-enable",
            "--aq-bitw", "2", "--aq_clip_learnable",
            "--output", str(tmp_path), "--experiment", "exp"])
        Runner(args).fit()
        exp = str(tmp_path / "exp")
        out = str(tmp_path / "export.pth.tar")
        export_main([exp, out])

        trained = Predictor.from_experiment(exp, batch_size=1).params
        back = convert_deit(load_torch_state_dict(out),
                            depth=sum(1 for k in trained["params"]
                                      if k.startswith("blocks_")),
                            img_size=32)
        ours, theirs = _flat(trained["params"]), _flat(back)
        assert set(theirs) <= set(ours)
        for k in theirs:
            np.testing.assert_array_equal(
                np.asarray(ours[k], np.float32), theirs[k], err_msg=k)
        # quantizer state must actually be present in the export
        assert any("input_quant" in k for k in theirs)


SWIN_DEPTHS, SWIN_DIM, SWIN_HEADS = (1, 1), 12, (2, 2)


def _swin_qmodules():
    from ofq_tpu.quant import default_swin_qmodules

    return default_swin_qmodules(SWIN_DEPTHS)


def _our_swin(policy, x_t):
    from ofq_tpu.models.swin import SwinConfig, SwinTransformer

    cfg = SwinConfig(img_size=224, embed_dim=SWIN_DIM, depths=SWIN_DEPTHS,
                     num_heads=SWIN_HEADS, num_classes=CLASSES,
                     drop_path_rate=0.0)
    model = SwinTransformer(cfg=cfg, policy=policy)
    x = jnp.asarray(np.transpose(x_t.numpy(), (0, 2, 3, 1)))
    variables = jax.jit(
        lambda k, xx: model.init({"params": k}, xx, train=False)
    )(jax.random.key(0), x)
    params = _perturb_ours(variables["params"])
    variables = {**variables, "params": jax.tree.map(jnp.asarray, params)}
    ours = np.asarray(jax.jit(
        lambda v, xx: model.apply(v, xx, train=False)[0])(variables, x))
    return params, variables.get("quant_stats"), ours


def _tiny_reference_swin():
    rl.install()
    from src.swin import SwinTransformer as RefSwin

    torch.manual_seed(0)
    return RefSwin(
        patch_size=[4, 4], embed_dim=SWIN_DIM, depths=list(SWIN_DEPTHS),
        num_heads=list(SWIN_HEADS), window_size=[7, 7],
        stochastic_depth_prob=0.0, num_classes=CLASSES)


def test_swin_depth_detection():
    """export_experiment_torch derives Swin depths from features_<f>_<b>
    keys (stage feature indices 1,3,5,7; PatchMerging nodes and non-stage
    keys must not confuse it)."""
    from ofq_tpu.convert.torch_export import swin_depths_from_params

    params = {"patch_embed": {}, "patch_norm": {}, "norm": {}, "head": {},
              "features_2": {}, "features_4": {}, "features_6": {}}
    for f, blocks in ((1, 2), (3, 2), (5, 6), (7, 2)):
        for b in range(blocks):
            params[f"features_{f}_{b}"] = {}
    assert swin_depths_from_params(params) == (2, 2, 6, 2)


class TestSwinExport:
    def test_qkr(self):
        x_t = _x(seed=11)
        pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                               qmodules=_swin_qmodules(), qk_reparam=True)
        params, qs, ours = _our_swin(pol, x_t)
        sd = export_swin(params, depths=SWIN_DEPTHS, quant_stats=qs)
        _assert_roundtrip(
            {k: v for k, v in sd.items()
             if "clip_val" not in k and ".signed" not in k},
            params, convert_swin, depths=SWIN_DEPTHS, img_size=224)
        ref = rl.quantize_reference(
            _tiny_reference_swin(), model_type="swin", wq_bitw=2,
            aq_bitw=2, qmodules=_swin_qmodules(), qk_reparam=True)
        rl.setup_alpha(ref, _x(seed=99, n=1))
        _load_reference(ref, sd,
                        missing_ok=("relative_position_index",))
        _assert_quantized_close(ours, _ref_forward(ref, x_t))

    def test_fp(self):
        x_t = _x(seed=12)
        params, qs, ours = _our_swin(policy_from_args(qmodules=()), x_t)
        sd = export_swin(params, depths=SWIN_DEPTHS, quant_stats=qs)
        _assert_roundtrip(sd, params, convert_swin, depths=SWIN_DEPTHS,
                          img_size=224)
        ref = _tiny_reference_swin()
        _load_reference(ref, sd,
                        missing_ok=("relative_position_index",))
        np.testing.assert_allclose(ours, _ref_forward(ref, x_t),
                                   atol=1e-4, rtol=1e-3)
