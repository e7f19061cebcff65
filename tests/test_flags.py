"""Flag-surface parity: every accepted flag takes effect (VERDICT r1 #4/#5).

Covers --apply_q_attn_dropout modes, --wq_asym, prelu/rprelu act layers,
LsqQuantizer4img signedness autodetection, QKR Gram emission for qk-KD,
and the dampening-loss CLI path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofq_tpu.cli.common import parse_args, policy_from_namespace
from ofq_tpu.quant import default_deit_qmodules, policy_from_args


def tiny_policy(**kw):
    return policy_from_args(
        wq_bitw=2, aq_bitw=2, qmodules=default_deit_qmodules(2), **kw)


def tiny_model(policy):
    from ofq_tpu.models import DeiTConfig, VisionTransformer

    cfg = DeiTConfig(img_size=16, patch_size=8, embed_dim=12, depth=2,
                     num_heads=2, num_classes=5,
                     qqkkvv=policy.qk_reparam)
    return VisionTransformer(cfg=cfg, policy=policy)


def flat_paths(tree, prefix=""):
    out = []
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out += flat_paths(v, p)
        else:
            out.append(p)
    return out


class TestQAttnDropoutModes:
    def test_mode_gates_softmax_quantizer(self):
        x = jnp.ones((1, 16, 16, 3))
        trees = {}
        for mode in (0, 1, 2, 3):
            pol = tiny_policy(apply_q_attn_dropout=mode)
            m = tiny_model(pol)
            v = m.init(jax.random.key(0), x, train=False)
            trees[mode] = flat_paths(v["params"])
        for mode in (0, 3):
            assert any("quan_softmax" in p for p in trees[mode]), mode
        for mode in (1, 2):
            assert not any("quan_softmax" in p for p in trees[mode]), mode

    def test_policy_properties(self):
        assert tiny_policy(apply_q_attn_dropout=0).quantize_softmax
        assert tiny_policy(apply_q_attn_dropout=0).attn_dropout_enabled
        assert not tiny_policy(apply_q_attn_dropout=1).quantize_softmax
        assert tiny_policy(apply_q_attn_dropout=1).attn_dropout_enabled
        assert not tiny_policy(apply_q_attn_dropout=2).attn_dropout_enabled
        p3 = tiny_policy(apply_q_attn_dropout=3)
        assert p3.quantize_softmax and not p3.attn_dropout_enabled

    def test_cli_parses_int(self):
        args = parse_args(["synthetic", "--apply_q_attn_dropout", "2",
                           "--wq-enable", "--aq-enable",
                           "--wq-bitw", "2", "--aq-bitw", "2"])
        pol = policy_from_namespace(args)
        assert pol.q_attn_mode == 2
        assert not pol.quantize_softmax


class TestWqAsym:
    def test_statsq_rejects(self):
        with pytest.raises(ValueError, match="wq_asym"):
            tiny_policy(wq_asym=True, wq_mode="statsq")

    def test_lsq_weight_unsigned_range(self):
        from ofq_tpu.nn.quantizers import LsqWeight

        w = jnp.asarray(
            np.random.default_rng(0).normal(size=(8, 6)), jnp.float32)
        m = LsqWeight(bit=4, all_positive=True)
        v = m.init(jax.random.key(0), w)
        wq = m.apply(v, w)
        assert float(wq.min()) >= 0.0  # unsigned [0, 2^b-1] levels
        m_sym = LsqWeight(bit=4, all_positive=False)
        v2 = m_sym.init(jax.random.key(0), w)
        assert float(m_sym.apply(v2, w).min()) < 0.0

    def test_cli_flag_threads(self):
        args = parse_args(["synthetic", "--wq-enable", "--aq-enable",
                           "--wq-mode", "lsq", "--aq-mode", "lsq",
                           "--wq-bitw", "2", "--aq-bitw", "2", "--wq_asym"])
        pol = policy_from_namespace(args)
        assert not pol.weight.symmetric
        # model builds + forward runs with asym LSQ weights
        m = tiny_model(pol)
        x = jnp.ones((1, 16, 16, 3))
        v = m.init(jax.random.key(0), x, train=False)
        logits, _ = m.apply(v, x, train=False)
        assert bool(jnp.isfinite(logits).all())


class TestActLayers:
    @pytest.mark.parametrize("act", ["prelu", "rprelu"])
    def test_act_params_and_forward(self, act):
        pol = tiny_policy(act_layer=act)
        m = tiny_model(pol)
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 16, 16, 3)), jnp.float32)
        v = m.init(jax.random.key(0), x, train=False)
        paths = flat_paths(v["params"])
        assert any("mlp/act/alpha" in p for p in paths)
        if act == "rprelu":
            assert any("mlp/act/move1" in p for p in paths)
            assert any("mlp/act/move2" in p for p in paths)
        logits, _ = m.apply(v, x, train=False)
        assert bool(jnp.isfinite(logits).all())

    def test_prelu_matches_torch(self):
        import torch

        from ofq_tpu.nn.linear import PReLU

        x = np.random.default_rng(0).normal(size=(4, 7)).astype(np.float32)
        ours = PReLU()
        v = ours.init(jax.random.key(0), jnp.asarray(x))
        got = np.asarray(ours.apply(v, jnp.asarray(x)))
        want = torch.nn.PReLU()(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(got, want, rtol=1e-6)


class TestImgSignedAutodetect:
    def _quantizer(self):
        from ofq_tpu.nn.conv import LsqImgQuantizer

        return LsqImgQuantizer(bit=8)

    def test_positive_calibration_unsigned(self):
        q = self._quantizer()
        x = jnp.abs(jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 4, 4, 3)), jnp.float32))
        v = q.init(jax.random.key(0), x)
        assert not bool(v["quant_stats"]["signed"])
        y = q.apply(v, x)
        assert float(y.min()) >= 0.0  # unsigned range

    def test_signed_calibration(self):
        q = self._quantizer()
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 4, 4, 3)), jnp.float32)
        v = q.init(jax.random.key(0), x)
        assert bool(v["quant_stats"]["signed"])
        assert float(q.apply(v, x).min()) < 0.0

    def test_sticky_flip_on_negative_batch(self):
        q = self._quantizer()
        pos = jnp.abs(jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 4, 4, 3)), jnp.float32))
        v = q.init(jax.random.key(0), pos)
        neg = -pos
        _, updates = q.apply(v, neg, mutable=["quant_stats"])
        assert bool(updates["quant_stats"]["signed"])
        # and it never resets (sticky: lsq.py:341-342)
        v2 = {**v, **updates}
        _, updates2 = q.apply(v2, pos, mutable=["quant_stats"])
        assert bool(updates2["quant_stats"]["signed"])


class TestQKRGrams:
    def test_qkr_emits_attn_info(self):
        pol = tiny_policy(qk_reparam=True)
        m = tiny_model(pol)  # qqkkvv=True via policy.qk_reparam in helper
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 16, 16, 3)), jnp.float32)
        v = m.init(jax.random.key(0), x, train=False)
        _, infos = m.apply(v, x, train=False)
        assert infos is not None and len(infos) == 2
        for info in infos:
            assert info is not None and len(info) == 4
            for g in info:
                assert bool(jnp.isfinite(g).all())

    def test_kd_qk_loss_with_qkr_student(self):
        from ofq_tpu.train.losses import kd_soft_hard_qk

        pol = tiny_policy(qk_reparam=True)
        student = tiny_model(pol)
        from ofq_tpu.models import DeiTConfig, VisionTransformer

        tcfg = DeiTConfig(img_size=16, patch_size=8, embed_dim=12, depth=2,
                          num_heads=2, num_classes=5, qqkkvv=True)
        teacher = VisionTransformer(cfg=tcfg)
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 16, 16, 3)), jnp.float32)
        sv = student.init(jax.random.key(0), x, train=False)
        tv = teacher.init(jax.random.key(1), x, train=False)
        s_out, s_info = student.apply(sv, x, train=True,
                                      rngs={"dropout": jax.random.key(2),
                                            "droppath": jax.random.key(3)})
        t_out, t_info = teacher.apply(tv, x, train=False)
        loss = kd_soft_hard_qk(s_out, s_info, jnp.asarray([0, 1]),
                               t_out[0] if isinstance(t_out, tuple) else t_out,
                               t_info, include_v=True)
        assert bool(jnp.isfinite(loss))


class TestDampeningFlag:
    def test_loss_changes_with_weighting(self):
        from ofq_tpu.train.losses import dampening_loss

        pol = tiny_policy()
        m = tiny_model(pol)
        x = jnp.ones((1, 16, 16, 3))
        v = m.init(jax.random.key(0), x, train=False)
        d0 = dampening_loss(v["params"], bits=2, weighting=0.0)
        d1 = dampening_loss(v["params"], bits=2, weighting=1.0)
        assert float(d0) == 0.0
        assert float(d1) > 0.0

    def test_cli_flag_parses(self):
        args = parse_args(["synthetic", "--dampening-loss-weighting", "0.1"])
        assert args.dampening_loss_weighting == 0.1

    def test_gradient_semantics(self):
        """d/dw of weighting * sum((wq - clip(w))^2) with wq AND the clip
        bounds detached: the only gradient path is the clipped passthrough,
        so grad = -2*weighting*(wq - clip(w)) inside the clip range and 0
        where w is clipped.  (The reference's DampeningLoss, utils.py:79-121,
        is dead code — only ever instantiated with weighting=0, and its
        'nu2u'/'lsq' attribute lookups crash on its own statsq QLinear — so
        these are the reconstructed semantics, tested as our contract.)"""
        from ofq_tpu.quant.statsq import (_CLIP_HI_EPS, statsq_quantize,
                                          statsq_scale)
        from ofq_tpu.train.losses import dampening_loss

        rng = np.random.default_rng(7)
        w = jnp.asarray(rng.normal(size=(8, 6)) * 2.0, jnp.float32)
        params = {"blocks_0": {"attn": {"qkv": {"kernel": w}}}}
        weighting = 0.3

        grad = jax.grad(
            lambda p: dampening_loss(p, bits=2, weighting=weighting)
        )(params)["blocks_0"]["attn"]["qkv"]["kernel"]

        s = statsq_scale(w)
        w_clip = jnp.clip(w, -s, s * (1.0 - _CLIP_HI_EPS))
        wq = statsq_quantize(w, 2)
        inside = (w > -s) & (w < s * (1.0 - _CLIP_HI_EPS))
        expected = jnp.where(inside, -2.0 * weighting * (wq - w_clip), 0.0)
        np.testing.assert_allclose(np.asarray(grad), np.asarray(expected),
                                   rtol=1e-6, atol=1e-6)
        # the clip saturates for |w| >= s somewhere in this draw
        assert bool(jnp.any(~inside))


class TestBf16Masters:
    def test_step_preserves_dtypes_and_converges(self):
        import optax

        from ofq_tpu.train import TrainState, make_train_step

        pol = tiny_policy()
        m = tiny_model(pol)
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(8, 16, 16, 3)), jnp.float32)
        y = jnp.asarray(np.arange(8) % 5, jnp.int32)
        v = m.init(jax.random.key(0), x, train=False)
        v = {**v, "params": jax.tree.map(
            lambda p: p.astype(jnp.bfloat16), v["params"])}
        tx = optax.adam(5e-3)
        state = TrainState.create(v, tx)
        step = jax.jit(make_train_step(
            m, tx, loss_kind="ce", master_dtype="bfloat16"))
        losses = []
        for i in range(20):
            state, metrics = step(state, {"image": x, "label": y},
                                  jax.random.key(i))
            losses.append(float(metrics["loss"]))
        # params stay bf16; Adam moments are fp32
        assert all(p.dtype == jnp.bfloat16
                   for p in jax.tree.leaves(state.params["params"]))
        mu = state.opt_state[0].mu if hasattr(state.opt_state[0], "mu") \
            else state.opt_state[0][0].mu
        assert all(mval.dtype == jnp.float32 for mval in jax.tree.leaves(mu))
        assert losses[-1] < losses[0] * 0.8, losses

    def test_eval_step_upcasts(self):
        from ofq_tpu.train import make_eval_step

        pol = tiny_policy()
        m = tiny_model(pol)
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(4, 16, 16, 3)), jnp.float32)
        v = m.init(jax.random.key(0), x, train=False)
        v16 = {**v, "params": jax.tree.map(
            lambda p: p.astype(jnp.bfloat16), v["params"])}
        step = make_eval_step(m)
        out = step(v16, {"image": x, "label": jnp.asarray([0, 1, 2, 3])})
        assert int(out["count"]) == 4
