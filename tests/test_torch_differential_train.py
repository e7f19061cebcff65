"""Full-model BACKWARD + training-TRAJECTORY differential vs the genuine
reference torch modules (round-4 verdict, top item).

Forward parity + piecewise per-quantizer gradient parity leave the
COMPOSITIONAL backward unproven: per-site grad-scale wiring, LearnableBias
cotangents, the W_qk product backward through two kernels, and the
CGA-mask / AdamW-moment interaction could all diverge while every
existing test stays green.  This suite closes that:

  (a) one KD `loss.backward()` through quantized DeiT / Swin: per-leaf
      gradient comparison in fp64 vs torch autograd through the real
      reference modules (train.py:860-995's loss/backward semantics),
  (b) a 10-step AdamW trajectory on identical batches vs a transcribed
      reference step (timm add_weight_decay param groups, betas/eps/wd,
      per-step LR from our schedule), step-10 weights within fp64 noise,
  (c) the same with CGA enabled, the torch side driven by the GENUINE
      `freeze_outside_boundary_weight_idx` imported from the reference's
      cga.py (:450-469) inside the reference's mask -> step -> restore
      ordering (cga.py:953-1013),
  (d) an AGC-enabled trajectory using the reference's own
      `adaptive_clip_grad` on `parameters()[:-2]` (timm model_parameters
      exclude_head semantics, train.py:930-932).

Methodology: fp64 both sides (same as test_torch_differential_real) —
rounding-decision ties within fp64 noise are essentially impossible, so
any per-leaf |dgrad| above 1e-6 is a genuine wiring bug.  The jax side
runs OUR production machinery (make_train_step / make_optimizer /
TrainState) eagerly under disable_jit.

Decidability: a deliberately mis-wired LSQ grad-scale factor fails the
backward differential (TestMiswiredGradScale).
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
from test_torch_differential_real import _overlay_f64, _x64
from ofq_tpu.convert import convert_deit, convert_swin
from ofq_tpu.models import DeiTConfig, VisionTransformer
from ofq_tpu.models.swin import SwinConfig
from ofq_tpu.models.swin import SwinTransformer as OurSwin
from ofq_tpu.quant import (default_deit_qmodules, default_swin_qmodules,
                           policy_from_args)
from ofq_tpu.train.loop import make_train_step
from ofq_tpu.train.losses import kd_soft_and_hard
from ofq_tpu.train.optim import make_optimizer
from ofq_tpu.train.schedule import cosine_with_warmup_cooldown
from ofq_tpu.train.state import TrainState

DEPTH, DIM, HEADS, CLASSES = 2, 24, 3, 10
WD, BETAS, EPS = 0.05, (0.9, 0.999), 1e-8


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flat(v, p))
        else:
            out[p] = np.asarray(v)
    return out


# ------------------------------------------------------------- builders

def _build_deit(bits, *, qk_reparam=True, qk_reparam_type=0,
                wq_mode="statsq", dim=DIM, heads=HEADS, depth=DEPTH,
                classes=CLASSES, n=2, bn=False):
    """(torch fp64 quantized model, our model, torch sd, x_t).

    wq_learnable=False matches the reference surgery's weight config
    (`rl.quantize_reference` passes learnable=False, like every shipped
    script: no train_scripts/* passes --wq_clip_learnable) — frozen
    weight scales on their side must show as ZERO scale gradients on
    ours (checked in _compare_grad_trees).

    bn=True applies the reference's replace_ln_by_bn1d AFTER surgery
    (train.py:512->521 ordering); the returned sd excludes BN running
    stats (they are 0/1 on both sides — setup_alpha runs in eval mode —
    and live in 'batch_stats', not params)."""
    torch.manual_seed(0)
    m = rl.build_reference_deit(depth=depth, embed_dim=dim, num_heads=heads,
                                num_classes=classes)
    x_t = td._x(n=n)
    qm = rl.quantize_reference(
        m, wq_bitw=bits, aq_bitw=bits, wq_mode=wq_mode, aq_mode="lsq",
        qmodules=default_deit_qmodules(depth),
        qk_reparam=qk_reparam, qk_reparam_type=qk_reparam_type)
    if bn:
        from src.utils.utils import replace_ln_by_bn1d

        qm = replace_ln_by_bn1d(qm)
    rl.setup_alpha(qm, x_t)
    td._perturb(qm)
    qm = qm.double()
    # .copy(): .numpy() returns VIEWS of the live torch storage — the
    # trajectory tests train the torch model in place afterwards
    sd = {k: v.detach().numpy().copy() for k, v in qm.state_dict().items()
          if not k.endswith(("running_mean", "running_var",
                             "num_batches_tracked"))}
    pol = policy_from_args(
        wq_bitw=bits, aq_bitw=bits, wq_mode=wq_mode, aq_mode="lsq",
        wq_learnable=False,
        qmodules=default_deit_qmodules(depth),
        qk_reparam=qk_reparam, qk_reparam_type=qk_reparam_type)
    cfg = DeiTConfig(img_size=224, patch_size=16, embed_dim=dim, depth=depth,
                     num_heads=heads, num_classes=classes,
                     norm_layer="batchnorm" if bn else "layernorm")
    return qm, VisionTransformer(cfg=cfg, policy=pol), sd, x_t


def _build_teacher_deit(*, dim=DIM, heads=HEADS, depth=DEPTH,
                        classes=CLASSES, seed=33):
    """FP torch teacher + our FP twin (eval-mode mean logits both sides)."""
    torch.manual_seed(seed)
    tm = rl.build_reference_deit(depth=depth, embed_dim=dim, num_heads=heads,
                                 num_classes=classes).double().eval()
    tsd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    cfg = DeiTConfig(img_size=224, patch_size=16, embed_dim=dim, depth=depth,
                     num_heads=heads, num_classes=classes)
    tmodel = VisionTransformer(cfg=cfg, policy=policy_from_args(qmodules=()))
    return tm, tmodel, tsd


def _our_variables_f64(model, sd, x, convert_fn, **kw):
    """Init + strict-convert + fp64 overlay (must run inside _x64())."""
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    loaded = td._convert_strict(sd, variables["params"], convert_fn, **kw)
    params = _overlay_f64(variables["params"], loaded)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), params)
    return {**variables, "params": params}


def _overlay_plain(model, sd, x, convert_fn, **kw):
    """Non-strict fp64 overlay (teachers: plain FP trees)."""
    variables = model.init({"params": jax.random.key(7)}, x, train=False)
    loaded = convert_fn(sd, **kw)
    params = _overlay_f64(variables["params"], loaded)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), params)
    return {**variables, "params": params}


def _labels(n, classes=CLASSES, seed=5):
    g = torch.Generator().manual_seed(seed)
    return torch.randint(0, classes, (n,), generator=g)


def _kd_loss_cls():
    rl.install()
    from src.quantization.utils import KDLossSoftandHard

    return KDLossSoftandHard()


# ----------------------------------------------------- (a) backward

def _torch_backward(qm, x_t, y_t, t_logits):
    qm.train()
    qm.zero_grad(set_to_none=True)
    out, _ = qm(x_t.double())
    loss = _kd_loss_cls()(out, y_t, t_logits)
    loss.backward()
    grads = {n: p.grad.detach().numpy()
             for n, p in qm.named_parameters() if p.grad is not None}
    return float(loss.detach()), grads


def _compare_grad_trees(our_grads, torch_grads, convert_fn, tol=1e-6, **kw):
    want = _flat(convert_fn(torch_grads, **kw))
    got = _flat(our_grads)
    missing = set(want) - set(got)
    assert not missing, f"torch grads with no counterpart: {sorted(missing)[:6]}"
    extra = set(got) - set(want)
    for p in sorted(extra):
        # a param with no torch .grad is requires_grad=False there (e.g.
        # non-learnable weight scales): ours must be exactly zero-grad
        assert float(np.abs(got[p]).max()) == 0.0, (
            f"{p}: our grad is nonzero but the reference param is frozen")
    worst = (None, 0.0)
    for p in want:
        d = np.abs(got[p] - want[p])
        scale = max(1.0, float(np.abs(want[p]).max()))
        rel = float(d.max()) / scale
        if rel > worst[1]:
            worst = (p, rel)
        assert rel < tol, (
            f"{p}: max |dgrad| {d.max():.3e} (grad scale "
            f"{np.abs(want[p]).max():.3e}) — compositional backward "
            f"divergence")
    return worst


def _deit_backward_case(bits, **kwargs):
    qm, model, sd, x_t = _build_deit(bits, **kwargs)
    dim = kwargs.get("dim", DIM)
    heads = kwargs.get("heads", HEADS)
    depth = kwargs.get("depth", DEPTH)
    classes = kwargs.get("classes", CLASSES)
    n = kwargs.get("n", 2)
    tm, tmodel, tsd = _build_teacher_deit(dim=dim, heads=heads, depth=depth,
                                          classes=classes)
    y_t = _labels(n, classes)
    with torch.no_grad():
        t_logits = tm(x_t.double())[0]
    loss_t, grads_t = _torch_backward(qm, x_t, y_t, t_logits)

    x_np = np.transpose(x_t.numpy(), (0, 2, 3, 1)).astype(np.float64)
    with _x64(), jax.disable_jit():
        x = jnp.asarray(x_np)
        variables = _our_variables_f64(model, sd, x, convert_deit,
                                       depth=depth, img_size=224)
        y = jnp.asarray(y_t.numpy())
        t_log = jnp.asarray(t_logits.numpy())

        def loss_fn(params):
            has_bn = "batch_stats" in variables
            out_aux = model.apply(
                {**variables, "params": params}, x, train=True,
                mutable=(["batch_stats"] if has_bn else False),
                rngs={"dropout": jax.random.key(1),
                      "droppath": jax.random.key(2)})
            out, _ = out_aux[0] if has_bn else out_aux
            return kd_soft_and_hard(out, y, t_log)

        loss_j, grads_j = jax.value_and_grad(loss_fn)(variables["params"])
        loss_j = float(loss_j)
        grads_j = jax.tree.map(np.asarray, grads_j)
    assert abs(loss_j - loss_t) < 1e-9, (loss_j, loss_t)
    _compare_grad_trees(grads_j, grads_t, convert_deit, depth=depth,
                        img_size=224)


class TestDeiTBackwardDifferential:
    def test_qkr_w2(self):
        """The flagship wiring: QKR W2A2 — W_qk product backward through
        q_kernel AND k_kernel, LSQ_input chain, softmax-quant cotangents."""
        _deit_backward_case(2)

    def test_qkr_type1_w2(self):
        """qk_reparam_type=1 (CGA in-forward quantizer) in TRAIN mode —
        proves the band-masking is gradient-inert compositionally."""
        _deit_backward_case(2, qk_reparam_type=1)

    def test_statsq_lsq_no_qkr_w3(self):
        _deit_backward_case(3, qk_reparam=False)

    def test_bn_swap_w2(self):
        """--replace-ln-by-bn backward: gradients flow THROUGH the batch
        statistics (mean/var are functions of x), the genuinely new
        wiring vs the LN cases — per-leaf parity incl. the BN affine
        params vs torch autograd through replace_ln_by_bn1d."""
        _deit_backward_case(2, bn=True)

    def test_full_lsq_w4(self):
        """LSQ weights AND acts: per-row weight-scale gradients (with the
        per-shape grad-factor quirks) through the whole model."""
        _deit_backward_case(4, qk_reparam=False, wq_mode="lsq")


SWIN_DEPTHS, SWIN_DIM, SWIN_HEADS = (1, 1), 12, (2, 2)


def _build_swin(bits):
    torch.manual_seed(0)
    qm = rl.quantize_reference(
        td._tiny_reference_swin(), model_type="swin", wq_bitw=bits,
        aq_bitw=bits, qmodules=td._swin_qmodules(),
        qk_reparam=True, qk_reparam_type=0)
    x_t = td._x(n=2)
    rl.setup_alpha(qm, x_t)
    td._perturb(qm)
    qm = qm.double()
    # .copy(): .numpy() returns VIEWS of the live torch storage — the
    # trajectory tests train the torch model in place afterwards
    sd = {k: v.detach().numpy().copy() for k, v in qm.state_dict().items()}
    pol = policy_from_args(wq_bitw=bits, aq_bitw=bits,
                           qmodules=td._swin_qmodules(), qk_reparam=True)
    cfg = SwinConfig(img_size=224, embed_dim=SWIN_DIM, depths=SWIN_DEPTHS,
                     num_heads=SWIN_HEADS, num_classes=CLASSES,
                     drop_path_rate=0.0)
    return qm, OurSwin(cfg=cfg, policy=pol), sd, x_t


class TestSwinBackwardDifferential:
    def test_qkr_w2(self):
        """Swin QKR: window-batched W_qk backward + rel-pos-table and
        PatchMerging reduction gradients."""
        qm, model, sd, x_t = _build_swin(2)
        torch.manual_seed(44)
        tm = td._tiny_reference_swin().double().eval()
        tm = td._perturb(tm, seed=45)
        y_t = _labels(2)
        with torch.no_grad():
            t_logits = tm(x_t.double())[0]
        loss_t, grads_t = _torch_backward(qm, x_t, y_t, t_logits)

        x_np = np.transpose(x_t.numpy(), (0, 2, 3, 1)).astype(np.float64)
        with _x64(), jax.disable_jit():
            x = jnp.asarray(x_np)
            variables = _our_variables_f64(model, sd, x, convert_swin,
                                           depths=SWIN_DEPTHS, img_size=224)
            y = jnp.asarray(y_t.numpy())
            t_log = jnp.asarray(t_logits.numpy())

            def loss_fn(params):
                out, _ = model.apply(
                    {**variables, "params": params}, x, train=True,
                    rngs={"dropout": jax.random.key(1),
                          "droppath": jax.random.key(2)})
                return kd_soft_and_hard(out, y, t_log)

            loss_j, grads_j = jax.value_and_grad(loss_fn)(variables["params"])
            loss_j = float(loss_j)
            grads_j = jax.tree.map(np.asarray, grads_j)
        assert abs(loss_j - loss_t) < 1e-9, (loss_j, loss_t)
        _compare_grad_trees(grads_j, grads_t, convert_swin,
                            depths=SWIN_DEPTHS, img_size=224)


class TestMiswiredGradScale:
    def test_doubled_grad_factor_fails(self, monkeypatch):
        """Decidability: doubling the LSQ grad-scale factor (the
        1/sqrt(thd_pos*numel) STE scaling, lsq.py:582-591) must trip the
        backward differential — scale gradients shift by 2x."""
        import ofq_tpu.quant.lsq as lsq_mod

        real = lsq_mod.grad_scale_factor
        monkeypatch.setattr(lsq_mod, "grad_scale_factor",
                            lambda *a, **k: 2.0 * real(*a, **k))
        with pytest.raises(AssertionError):
            _deit_backward_case(2)


# ------------------------------------------------- (b)/(c)/(d) trajectory

def _timm_param_groups(qm, no_decay_names):
    """timm add_weight_decay (create_optimizer_v2 filter_bias_and_bn):
    <=1-D params, *.bias, and model.no_weight_decay() names skip decay."""
    decay, no_decay = [], []
    for n, p in qm.named_parameters():
        if not p.requires_grad:
            continue
        if p.ndim <= 1 or n.endswith(".bias") or n in no_decay_names:
            no_decay.append(p)
        else:
            decay.append(p)
    return [{"params": no_decay, "weight_decay": 0.0},
            {"params": decay, "weight_decay": WD}]


CGA_SUFFIXES = ("fc1", "fc2", ".v", "proj")


def _torch_cga_mask_and_save(qm, bits, br, cga_mod):
    """Reference cga.py:953-977 (qk_reparam deit branch), driven by the
    GENUINE freeze_outside_boundary_weight_idx."""
    masks, frozen = {}, {}
    for k, v in qm.named_modules():
        if "blocks" in k and (k[-3:] in ("fc1", "fc2") or k[-2:] == ".v"
                              or k[-4:] == "proj"):
            fi = cga_mod.freeze_outside_boundary_weight_idx(
                v.weight, bits, boundaryRange=br)
            masks[k] = fi.detach().clone()
            v.weight.grad = v.weight.grad * (1 - fi)
            frozen[k] = (v.weight * fi).detach().clone()
    return masks, frozen


def _torch_cga_restore(qm, masks, frozen):
    """Reference cga.py:989-1013."""
    for k, v in qm.named_modules():
        if k in masks:
            with torch.no_grad():
                v.weight.data.copy_(
                    v.weight.detach() * (1 - masks[k]) + frozen[k])


def _trajectory_case(*, steps=10, cga=False, agc=None, bits=2, br=0.05,
                     steps_per_epoch=2, bn=False, weight_tol=1e-6,
                     outlier_tolerant=False):
    qk_reparam_type = 1 if cga else 0
    qm, model, sd, x_t0 = _build_deit(bits, qk_reparam=True,
                                      qk_reparam_type=qk_reparam_type,
                                      bn=bn)
    tm, tmodel, tsd = _build_teacher_deit()

    # identical batch stream on both sides
    batches = []
    for i in range(steps):
        x_i = td._x(seed=100 + i, n=2)
        y_i = _labels(2, seed=200 + i)
        batches.append((x_i, y_i))

    # per-step LR from OUR schedule, applied to both sides
    lr_epoch = cosine_with_warmup_cooldown(
        1e-3, epochs=3, warmup_epochs=1, warmup_lr=1e-4, min_lr=1e-5)
    lrs = [float(lr_epoch(i // steps_per_epoch)) for i in range(steps)]

    # ------------------------------------------------------ torch side
    cga_mod = rl.reference_cga() if cga else None
    if agc is not None:
        from src.quantization.utils import adaptive_clip_grad
    kd = _kd_loss_cls()
    qm.train()
    groups = _timm_param_groups(qm, set(qm.no_weight_decay()))
    opt = torch.optim.AdamW(groups, lr=lrs[0], betas=BETAS, eps=EPS)
    losses_t = []
    for i, (x_i, y_i) in enumerate(batches):
        for g in opt.param_groups:
            g["lr"] = lrs[i]
        with torch.no_grad():
            t_logits = tm(x_i.double())[0]
        opt.zero_grad(set_to_none=True)
        out, _ = qm(x_i.double())
        loss = kd(out, y_i, t_logits)
        loss.backward()
        masks = frozen = None
        if cga:
            masks, frozen = _torch_cga_mask_and_save(qm, bits, br, cga_mod)
        if agc is not None:
            # timm model_parameters(exclude_head=True) == parameters()[:-2]
            adaptive_clip_grad(list(qm.parameters())[:-2], clip_factor=agc,
                               eps=1e-3)
        opt.step()
        if cga:
            _torch_cga_restore(qm, masks, frozen)
        losses_t.append(float(loss))
    sd_final = {k: v.detach().numpy().copy()
                for k, v in qm.state_dict().items()}

    # -------------------------------------------------------- our side
    with _x64(), jax.disable_jit():
        x0 = jnp.asarray(np.transpose(x_t0.numpy(), (0, 2, 3, 1)),
                         jnp.float64)
        variables = _our_variables_f64(model, sd, x0, convert_deit,
                                       depth=DEPTH, img_size=224)
        tvars = _overlay_plain(tmodel, tsd, x0, convert_deit, depth=DEPTH,
                               img_size=224)
        tx = make_optimizer(
            lambda count: lr_epoch(count // steps_per_epoch),
            weight_decay=WD, betas=BETAS, eps=EPS,
            clip_grad=agc, clip_mode="agc" if agc is not None else "norm")
        state = TrainState.create(variables, tx)
        cga_cfg = (dict(bits=bits, boundary_range=br, qk_reparam=True,
                        model_type="deit") if cga else None)
        step = make_train_step(model, tx, teacher=tmodel,
                               loss_kind="kd_soft_hard", cga=cga_cfg)
        for i, (x_i, y_i) in enumerate(batches):
            batch = {
                "image": jnp.asarray(
                    np.transpose(x_i.numpy(), (0, 2, 3, 1)), jnp.float64),
                "label": jnp.asarray(y_i.numpy()),
            }
            state, metrics = step(state, batch, jax.random.key(1000 + i),
                                  tvars["params"])
            loss_j = float(metrics["loss"])
            assert abs(loss_j - losses_t[i]) < 1e-8, (
                f"step {i}: loss {loss_j} vs torch {losses_t[i]} — "
                f"trajectories diverged")
        final = jax.tree.map(np.asarray, state.params["params"])
        final_bn = (jax.tree.map(np.asarray, state.params["batch_stats"])
                    if bn else None)

    want = _flat(convert_deit(
        {k: v for k, v in sd_final.items()
         if not any(s in k for s in td._UNMAPPED_OK)},
        depth=DEPTH, img_size=224))
    got = _flat(final)
    assert set(want) <= set(got)
    if outlier_tolerant:
        # _assert_quantized_close philosophy for trajectories: a wiring
        # bug shifts elements SYSTEMATICALLY (large median / large
        # outlier fraction); fp-noise-seeded STE boundary flips in a late
        # backward move a few tiny-gradient elements by up to ~2·lr
        # (Adam normalizes a sign-flipped noise gradient to a full-size
        # step) while the median stays at fp64 noise.
        alld = np.concatenate([
            np.abs(got[p] - want[p]).ravel() for p in want])
        assert float(np.median(alld)) < 1e-9, (
            f"median weight diff {np.median(alld):.3e} — systematic")
        frac = float((alld > 1e-6).mean())
        assert frac < 0.01, (
            f"{frac:.2%} of elements beyond 1e-6 — systematic divergence")
        assert float(alld.max()) < 5e-3, (
            f"max weight diff {alld.max():.3e} — beyond flip scale")
    else:
        for p in want:
            d = np.abs(got[p] - want[p])
            scale = max(1.0, float(np.abs(want[p]).max()))
            assert d.max() / scale < weight_tol, (
                f"{p}: step-{steps} weight diff {d.max():.3e} — "
                f"optimizer/CGA trajectory divergence")
    if bn:
        from ofq_tpu.convert import convert_bn_stats

        want_bn = _flat(convert_bn_stats(sd_final))
        got_bn = _flat(final_bn)
        assert set(want_bn) == set(got_bn)
        bn_all = np.concatenate([
            np.abs(got_bn[p] - want_bn[p]).ravel() for p in want_bn])
        # stats are EMAs of the (flip-perturbed) activations: once a few
        # weights differ at flip scale, every later batch-stat update
        # inherits ~1e-8 drift (measured median 2e-8).  The 1e-6 bound
        # still decisively catches semantic bugs — flax's biased-variance
        # update alone is a 1/(n-1) ≈ 2.5e-3 RELATIVE error
        assert float(np.median(bn_all)) < 1e-6, (
            f"median running-stat diff {np.median(bn_all):.3e}")
        assert float(bn_all.max()) < 1e-3, (
            f"max running-stat diff {bn_all.max():.3e}")


class TestTrajectoryDifferential:
    def test_adamw_10_steps(self):
        """(b) AdamW + wd-mask + per-step LR schedule, 10 identical
        batches: step-10 weights match the transcribed reference loop
        (train.py:860-995) to fp64 noise."""
        _trajectory_case(steps=10)

    def test_cga_8_steps(self):
        """(c) CGA trajectory: masks from the GENUINE reference
        freeze_outside_boundary_weight_idx, reference mask->step->restore
        ordering (cga.py:953-1013) vs our in-graph freeze/restore —
        including the AdamW-moment updates of frozen weights."""
        _trajectory_case(steps=8, cga=True)

    def test_agc_6_steps(self):
        """(d) AGC-clipped trajectory (reference adaptive_clip_grad on
        parameters()[:-2], train.py:930-932) through the optimizer chain."""
        _trajectory_case(steps=6, agc=0.01)

    def test_bn_swap_6_steps(self):
        """(e) --replace-ln-by-bn trajectory: BN affine params train
        under the timm 1-D no-decay rule while running statistics evolve
        in 'batch_stats' — step-6 weights AND running stats match the
        reference loop (unbiased-variance update compounding across
        steps).

        Outlier-tolerant criterion (unlike the LN cases' strict 1e-6):
        BN's batch-stat reductions differ from torch only in fp64
        summation ORDER (~1e-16), but that seed flips a handful of STE
        clip-boundary decisions in a late backward.  Measured (8-step
        instrumented run): per-step |dloss| 7.5e-12 -> 4.6e-10 — the
        forward is essentially exact the whole way — while 0.17% of
        weight elements (tiny-gradient move_aft biases, where Adam turns
        a sign-flipped noise gradient into a full ~lr-size step) land at
        flip scale and the median sits at 5e-12.  A wiring bug moves the
        median and fails the strict single-step BN backward differential
        above; this is chaos, not mis-wiring."""
        _trajectory_case(steps=6, bn=True, outlier_tolerant=True)


# ----------------------------------------- real-geometry spot check

@pytest.mark.slow
class TestRealGeometryBackward:
    def test_deit_s_qkr_w2_backward(self):
        """One full backward at DeiT-S production geometry (embed 384,
        12 blocks, 1000 classes, 224px) — per-leaf gradient parity vs
        torch autograd through the genuine reference modules."""
        _deit_backward_case(2, dim=384, heads=6, depth=12, classes=1000,
                            n=1)


# --------------------------------- train-mode BN-swap differential (r4 #7)

class TestBnSwapTrainModeDifferential:
    """--replace-ln-by-bn, train mode, vs the reference's own
    `replace_ln_by_bn1d` (src/utils/utils.py; hooked train.py:521-522).

    Closes the round-4 eval-mode-only caveat: one train=True forward
    through the BN-swapped quantized DeiT comparing logits AND the
    updated running statistics.  Two torch semantics a plain flax
    nn.BatchNorm gets wrong (hence models/deit.TorchBatchNorm):
    running_var updates with the UNBIASED batch variance, and eps is
    torch's BatchNorm default 1e-5 — the reference's build_bn_from_ln
    DROPS the LN's 1e-6.  Swin has no torch counterpart (the reference
    crashes on its 4-D maps, SwinConfig.norm_layer); its BN path is
    unit-tested in test_swin.py."""

    def _build(self, bits=2, n=4):
        torch.manual_seed(0)
        m = rl.build_reference_deit(depth=DEPTH, embed_dim=DIM,
                                    num_heads=HEADS, num_classes=CLASSES)
        x_t = td._x(n=n)
        qm = rl.quantize_reference(
            m, wq_bitw=bits, aq_bitw=bits, wq_mode="statsq", aq_mode="lsq",
            qmodules=default_deit_qmodules(DEPTH),
            qk_reparam=True, qk_reparam_type=0)
        from src.utils.utils import replace_ln_by_bn1d

        qm = replace_ln_by_bn1d(qm)  # AFTER surgery (train.py:512->521)
        rl.setup_alpha(qm, x_t)      # eval mode: running stats stay 0/1
        td._perturb(qm)
        qm = qm.double()
        sd = {k: v.detach().numpy().copy()
              for k, v in qm.state_dict().items()}
        pol = policy_from_args(
            wq_bitw=bits, aq_bitw=bits, wq_mode="statsq", aq_mode="lsq",
            wq_learnable=False, qmodules=default_deit_qmodules(DEPTH),
            qk_reparam=True, qk_reparam_type=0)
        cfg = DeiTConfig(img_size=224, patch_size=16, embed_dim=DIM,
                         depth=DEPTH, num_heads=HEADS, num_classes=CLASSES,
                         norm_layer="batchnorm")
        return qm, VisionTransformer(cfg=cfg, policy=pol), sd, x_t

    def test_deit_w2_train_forward_and_running_stats(self):
        from ofq_tpu.convert import convert_bn_stats

        qm, model, sd, x_t = self._build()
        qm.train()
        with torch.no_grad():
            out_t, _ = qm(x_t.double())
        cls_t, dist_t = (o.detach().numpy() for o in out_t)
        stats_t = {k: v.detach().numpy().copy()
                   for k, v in qm.state_dict().items()
                   if k.endswith(("running_mean", "running_var"))}
        # params-only sd for the strict converter; BN stats ride their
        # own collection via convert_bn_stats
        sd_params = {k: v for k, v in sd.items()
                     if not k.endswith(("running_mean", "running_var",
                                        "num_batches_tracked"))}

        x_np = np.transpose(x_t.numpy(), (0, 2, 3, 1)).astype(np.float64)
        with _x64(), jax.disable_jit():
            x = jnp.asarray(x_np)
            variables = _our_variables_f64(model, sd_params, x, convert_deit,
                                           depth=DEPTH, img_size=224)
            bn0 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64),
                               convert_bn_stats(sd))
            got0 = _flat(jax.tree.map(np.asarray, bn0))
            want0 = _flat(jax.tree.map(
                np.asarray, variables["batch_stats"]))
            assert set(got0) == set(want0), (
                sorted(set(got0) ^ set(want0))[:6])
            variables = {**variables, "batch_stats": bn0}
            (out_j, _), mut = model.apply(
                variables, x, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(1),
                      "droppath": jax.random.key(2)})
            cls_j, dist_j = (np.asarray(o) for o in out_j)

        for name, a, b in (("cls", cls_j, cls_t), ("dist", dist_j, dist_t)):
            d = float(np.abs(a - b).max())
            assert d < 1e-6, f"{name} train-mode logits diverge: {d:.3e}"
        got = _flat(jax.tree.map(np.asarray, mut["batch_stats"]))
        want = _flat(convert_bn_stats(stats_t))
        assert set(got) == set(want)
        for p in sorted(want):
            d = float(np.abs(got[p] - want[p]).max())
            assert d < 1e-9, (
                f"{p}: running-stat update diverges by {d:.3e} "
                f"(unbiased-variance / momentum semantics)")

    def test_eval_mode_uses_running_stats(self):
        """After the train step, eval-mode logits must come from the
        UPDATED running stats (use_running_average path) and match torch
        eval."""
        from ofq_tpu.convert import convert_bn_stats

        qm, model, sd, x_t = self._build(n=2)
        qm.train()
        with torch.no_grad():
            qm(x_t.double())  # one train step's stat update
        qm.eval()
        with torch.no_grad():
            out_t, _ = qm(x_t.double())
        out_t = out_t.detach().numpy()  # eval: (cls+dist)/2 mean logits
        stats_t = {k: v.detach().numpy().copy()
                   for k, v in qm.state_dict().items()
                   if k.endswith(("running_mean", "running_var"))}
        sd_params = {k: v for k, v in sd.items()
                     if not k.endswith(("running_mean", "running_var",
                                        "num_batches_tracked"))}
        x_np = np.transpose(x_t.numpy(), (0, 2, 3, 1)).astype(np.float64)
        with _x64(), jax.disable_jit():
            x = jnp.asarray(x_np)
            variables = _our_variables_f64(model, sd_params, x, convert_deit,
                                           depth=DEPTH, img_size=224)
            bn = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64),
                              convert_bn_stats(stats_t))
            out_j, _ = model.apply({**variables, "batch_stats": bn},
                                   x, train=False)
            out_j = np.asarray(out_j)
        d = float(np.abs(out_j - out_t).max())
        assert d < 1e-6, f"eval-mode BN logits diverge: {d:.3e}"
