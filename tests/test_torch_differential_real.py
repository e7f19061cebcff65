"""REAL-GEOMETRY torch-differential parity (round-3 verdict, top item).

The toy differential suite (test_torch_differential.py) runs DIM=24/depth-2
DeiT and dims-12 Swin; this file runs the ACTUAL production shapes of every
recipe the reference ships (eval_scripts/, README.md:38-51):

  * DeiT-T  embed 192, 12 blocks, 3 heads, head_dim 64
  * DeiT-S  embed 384, 12 blocks, 6 heads, head_dim 64
  * Swin-T  depths [2,2,6,2], dims 96->768, heads [3,6,12,24],
            169-entry rel-pos tables, shifted windows at every stage
  at W2A2 / W3A3 / W4A4 QKR (+ non-QKR and full-LSQ spot checks),
  1000 classes, 224x224 input — against the genuine reference torch
  modules after their own surgery.

Methodology: fp32 logits of a 12-block low-bit net are chaotic (a ~1e-7
perturbation entering a quantizer flips a rounding decision and cascades;
measured median logit shift 0.12 at DeiT-S — indistinguishable from a real
bug by magnitude).  So both sides run in FLOAT64, where a boundary tie
within summation-order noise (~1e-13) is essentially impossible: any
diff above ~1e-6 is a genuine mapping/geometry bug, and the suite asserts
max |diff| <= 1e-6 (observed: ~1e-9).  The jax side runs eagerly
(disable_jit) — XLA-compiling 12 real-size blocks on this 1-core CPU box
costs ~5 min/case; eager is ~30 s and numerically identical.

Reference: src/quantization/modules/attention.py:107-222,
swin_attention_and_mlp.py:253-671, src/deit.py:20-67, src/swin.py:441-553.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 1)[0])

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import reference_loader as rl
import test_torch_differential as td
from ofq_tpu.convert import convert_deit, convert_swin
from ofq_tpu.models import DeiTConfig, VisionTransformer
from ofq_tpu.models.swin import SwinConfig
from ofq_tpu.models.swin import SwinTransformer as OurSwin
from ofq_tpu.quant import (default_deit_qmodules, default_swin_qmodules,
                           policy_from_args)

pytestmark = pytest.mark.slow


import contextlib


@contextlib.contextmanager
def _x64():
    """Scoped jax_enable_x64 (jax 0.9 removed experimental.enable_x64).

    Safe here because every fp64 computation in this file runs under
    disable_jit — nothing is cached against the flag."""
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)

CLASSES = 1000
TOL = 1e-6  # fp64: mapping bugs are O(1), summation noise is ~1e-9


def _overlay_f64(dst, src):
    """merge_pretrained without its fp32 cast: the differential must not
    round the reference's fp64 weights (a cast reintroduces ~1e-8 noise
    that can flip quantizer roundings)."""
    out = dict(dst)
    for k, v in src.items():
        if k not in dst:
            continue
        if isinstance(v, dict):
            out[k] = _overlay_f64(dst[k], v)
        elif tuple(np.shape(dst[k])) == tuple(np.shape(v)):
            out[k] = np.asarray(v, np.float64)
    return out


def _our_logits_f64(model, sd, x_t, convert_fn, **conv_kw):
    """Eager fp64 forward of `model` with params converted from `sd`.

    enable_x64 is scoped to this call (the rest of the suite runs the
    production fp32 configuration from conftest); disable_jit keeps the
    numerics identical while skipping the ~5 min/case XLA CPU compile."""
    x_np = np.transpose(x_t.numpy(), (0, 2, 3, 1)).astype(np.float64)
    with _x64(), jax.disable_jit():
        x = jnp.asarray(x_np)
        assert x.dtype == jnp.float64
        variables = model.init({"params": jax.random.key(0)}, x, train=False)
        loaded = td._convert_strict(sd, variables["params"], convert_fn,
                                    **conv_kw)
        params = _overlay_f64(variables["params"], loaded)
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), params)
        out = model.apply({**variables, "params": params}, x, train=False)
        return np.asarray(out[0])


def _torch_logits_f64(qm, x_t):
    qm = qm.double()
    qm.eval()
    with torch.no_grad():
        theirs, _ = qm(x_t.double())
    return theirs.numpy()


def _assert_real_parity(ours, theirs):
    d = np.abs(ours - theirs)
    assert ours.dtype == np.float64
    assert d.max() < TOL, (
        f"max |diff| {d.max():.3e} (median {np.median(d):.3e}) — beyond "
        f"fp64 noise: a genuine mapping/geometry divergence")


# --------------------------------------------------------------- DeiT

DEIT_GEOM = {"deit_t": (192, 3), "deit_s": (384, 6)}
DEPTH = 12


def _deit_case(variant, bits, *, qk_reparam=True, qk_reparam_type=0,
               wq_mode="statsq", aq_mode="lsq"):
    dim, heads = DEIT_GEOM[variant]
    torch.manual_seed(0)
    m = rl.build_reference_deit(depth=DEPTH, embed_dim=dim, num_heads=heads,
                                num_classes=CLASSES)
    x_t = td._x(n=1)
    qm = rl.quantize_reference(
        m, wq_bitw=bits, aq_bitw=bits, wq_mode=wq_mode, aq_mode=aq_mode,
        qmodules=default_deit_qmodules(DEPTH),
        qk_reparam=qk_reparam, qk_reparam_type=qk_reparam_type)
    rl.setup_alpha(qm, x_t)
    td._perturb(qm)
    theirs = _torch_logits_f64(qm, x_t)
    sd = {k: v.detach().numpy() for k, v in qm.state_dict().items()}

    pol = policy_from_args(
        wq_bitw=bits, aq_bitw=bits, wq_mode=wq_mode, aq_mode=aq_mode,
        wq_learnable=(wq_mode == "lsq"),
        qmodules=default_deit_qmodules(DEPTH),
        qk_reparam=qk_reparam, qk_reparam_type=qk_reparam_type)
    cfg = DeiTConfig(img_size=224, patch_size=16, embed_dim=dim, depth=DEPTH,
                     num_heads=heads, num_classes=CLASSES)
    ours = _our_logits_f64(VisionTransformer(cfg=cfg, policy=pol), sd, x_t,
                           convert_deit, depth=DEPTH, img_size=224)
    _assert_real_parity(ours, theirs)


class TestDeiTRealGeometry:
    @pytest.mark.parametrize("bits", [2, 3, 4])
    def test_deit_s_qkr(self, bits):
        """The flagship recipes: DeiT-S W2A2/W3A3/W4A4 QKR
        (train_scripts/train_deit_small_*.sh)."""
        _deit_case("deit_s", bits)

    @pytest.mark.parametrize("bits", [2, 3, 4])
    def test_deit_t_qkr(self, bits):
        """DeiT-T W2A2/W3A3/W4A4 QKR (train_scripts/train_deit_tiny_*.sh)."""
        _deit_case("deit_t", bits)

    def test_deit_s_qkr_type1(self):
        """qk_reparam_type=1 (CGA-style outer transform) at real shapes."""
        _deit_case("deit_s", 2, qk_reparam_type=1)

    def test_deit_s_statsq_lsq_no_qkr(self):
        """Plain StatsQ+LSQ without reparameterization at real shapes."""
        _deit_case("deit_s", 2, qk_reparam=False)

    def test_deit_s_full_lsq(self):
        """--wq-mode lsq (LSQ weights AND activations) at real shapes."""
        _deit_case("deit_s", 4, qk_reparam=False, wq_mode="lsq")


# --------------------------------------------------------------- Swin

def _swin_case(bits, *, qk_reparam=True, qk_reparam_type=0):
    torch.manual_seed(0)
    m = rl.build_reference_swin(num_classes=CLASSES)
    x_t = td._x(n=1)
    qm = rl.quantize_reference(
        m, model_type="swin", wq_bitw=bits, aq_bitw=bits,
        qmodules=default_swin_qmodules(),
        qk_reparam=qk_reparam, qk_reparam_type=qk_reparam_type)
    rl.setup_alpha(qm, x_t)
    td._perturb(qm)
    theirs = _torch_logits_f64(qm, x_t)
    sd = {k: v.detach().numpy() for k, v in qm.state_dict().items()}

    pol = policy_from_args(
        wq_bitw=bits, aq_bitw=bits, qmodules=default_swin_qmodules(),
        qk_reparam=qk_reparam, qk_reparam_type=qk_reparam_type)
    cfg = SwinConfig(num_classes=CLASSES, drop_path_rate=0.0)
    ours = _our_logits_f64(OurSwin(cfg=cfg, policy=pol), sd, x_t,
                           convert_swin, depths=(2, 2, 6, 2), img_size=224)
    _assert_real_parity(ours, theirs)


class TestSwinRealGeometry:
    @pytest.mark.parametrize("bits", [2, 3, 4])
    def test_swin_t_qkr(self, bits):
        """Swin-T W2A2/W3A3/W4A4 QKR (train_scripts/train_swin_tiny_*.sh):
        real [2,2,6,2] depths, 96->768 dims, per-stage rel-pos tables and
        shifted-window masks."""
        _swin_case(bits)

    def test_swin_t_statsq_lsq_no_qkr(self):
        _swin_case(2, qk_reparam=False)


# ------------------------------------------------- export round-trip

def _roundtrip_deit(bits):
    """Train-side param tree -> torch_export -> the reference model loads
    it strict -> logits match ours, all at DeiT-S real geometry."""
    from ofq_tpu.convert.torch_export import export_state_dict

    dim, heads = DEIT_GEOM["deit_s"]
    torch.manual_seed(0)
    m = rl.build_reference_deit(depth=DEPTH, embed_dim=dim, num_heads=heads,
                                num_classes=CLASSES)
    x_t = td._x(n=1)
    qm = rl.quantize_reference(
        m, wq_bitw=bits, aq_bitw=bits,
        qmodules=default_deit_qmodules(DEPTH),
        qk_reparam=True, qk_reparam_type=0)
    rl.setup_alpha(qm, x_t)
    td._perturb(qm)
    sd = {k: v.detach().numpy() for k, v in qm.state_dict().items()}

    pol = policy_from_args(wq_bitw=bits, aq_bitw=bits,
                           qmodules=default_deit_qmodules(DEPTH),
                           qk_reparam=True, qk_reparam_type=0)
    cfg = DeiTConfig(img_size=224, patch_size=16, embed_dim=dim, depth=DEPTH,
                     num_heads=heads, num_classes=CLASSES)
    model = VisionTransformer(cfg=cfg, policy=pol)
    x_np = np.transpose(x_t.numpy(), (0, 2, 3, 1)).astype(np.float64)
    with _x64(), jax.disable_jit():
        x = jnp.asarray(x_np)
        variables = model.init({"params": jax.random.key(0)}, x, train=False)
        loaded = td._convert_strict(sd, variables["params"], convert_deit,
                                    depth=DEPTH, img_size=224)
        params = _overlay_f64(variables["params"], loaded)
        params_j = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), params)
        ours = np.asarray(model.apply(
            {**variables, "params": params_j}, x, train=False)[0])
        quant_stats = (jax.tree.map(np.asarray, variables["quant_stats"])
                       if "quant_stats" in variables else None)

    # export OUR tree back to a reference state_dict and load it into a
    # fresh reference model of the same geometry: no unexpected keys, no
    # missing keys, identical fp64 logits
    exported = export_state_dict(params, model_type="deit",
                                 quant_stats=quant_stats)
    torch.manual_seed(1)
    m2 = rl.build_reference_deit(depth=DEPTH, embed_dim=dim, num_heads=heads,
                                 num_classes=CLASSES)
    qm2 = rl.quantize_reference(
        m2, wq_bitw=bits, aq_bitw=bits,
        qmodules=default_deit_qmodules(DEPTH),
        qk_reparam=True, qk_reparam_type=0)
    rl.setup_alpha(qm2, x_t)  # materialize lazy LSQ scale shapes
    result = qm2.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in exported.items()}, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys[:8]
    assert not result.missing_keys, result.missing_keys[:8]
    theirs = _torch_logits_f64(qm2, x_t)
    _assert_real_parity(ours, theirs)


class TestExportRoundtripRealGeometry:
    def test_deit_s_w2_export(self):
        _roundtrip_deit(2)


def _roundtrip_swin(bits):
    """Train-side Swin param tree -> torch_export -> the reference Swin-T
    loads it (no missing/unexpected keys) -> fp64 logits match ours, at
    the real [2,2,6,2]/96->768 geometry (closes the round-3 verdict item's
    'torch re-export round-trip at the same geometry' clause for Swin)."""
    from ofq_tpu.convert.torch_export import export_state_dict

    torch.manual_seed(0)
    m = rl.build_reference_swin(num_classes=CLASSES)
    x_t = td._x(n=1)
    qm = rl.quantize_reference(
        m, model_type="swin", wq_bitw=bits, aq_bitw=bits,
        qmodules=default_swin_qmodules(),
        qk_reparam=True, qk_reparam_type=0)
    rl.setup_alpha(qm, x_t)
    td._perturb(qm)
    sd = {k: v.detach().numpy() for k, v in qm.state_dict().items()}

    pol = policy_from_args(
        wq_bitw=bits, aq_bitw=bits, qmodules=default_swin_qmodules(),
        qk_reparam=True, qk_reparam_type=0)
    cfg = SwinConfig(num_classes=CLASSES, drop_path_rate=0.0)
    model = OurSwin(cfg=cfg, policy=pol)
    x_np = np.transpose(x_t.numpy(), (0, 2, 3, 1)).astype(np.float64)
    with _x64(), jax.disable_jit():
        x = jnp.asarray(x_np)
        variables = model.init({"params": jax.random.key(0)}, x, train=False)
        loaded = td._convert_strict(sd, variables["params"], convert_swin,
                                    depths=(2, 2, 6, 2), img_size=224)
        params = _overlay_f64(variables["params"], loaded)
        params_j = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), params)
        ours = np.asarray(model.apply(
            {**variables, "params": params_j}, x, train=False)[0])
        quant_stats = (jax.tree.map(np.asarray, variables["quant_stats"])
                       if "quant_stats" in variables else None)

    exported = export_state_dict(params, model_type="swin",
                                 depths=(2, 2, 6, 2),
                                 quant_stats=quant_stats)
    torch.manual_seed(1)
    m2 = rl.build_reference_swin(num_classes=CLASSES)
    qm2 = rl.quantize_reference(
        m2, model_type="swin", wq_bitw=bits, aq_bitw=bits,
        qmodules=default_swin_qmodules(),
        qk_reparam=True, qk_reparam_type=0)
    rl.setup_alpha(qm2, x_t)  # materialize lazy LSQ scale shapes
    result = qm2.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in exported.items()}, strict=False)
    # non-param geometry buffers (rel-pos index, shift masks) are rebuilt
    # by the reference constructor, so only *_index/mask buffers may be
    # absent from the export
    missing = [k for k in result.missing_keys
               if not k.endswith(("relative_position_index", "attn_mask"))]
    assert not result.unexpected_keys, result.unexpected_keys[:8]
    assert not missing, missing[:8]
    theirs = _torch_logits_f64(qm2, x_t)
    _assert_real_parity(ours, theirs)


class TestSwinExportRoundtripRealGeometry:
    def test_swin_t_w2_export(self):
        _roundtrip_swin(2)
