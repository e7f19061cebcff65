"""Tests for losses, schedules, optimizer, CGA transform, and the train step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofq_tpu.models import DeiTConfig, VisionTransformer
from ofq_tpu.quant import default_deit_qmodules, policy_from_args
from ofq_tpu.train import (
    TrainState,
    cosine_with_warmup_cooldown,
    freeze_masks,
    hard_ce,
    is_cga_kernel,
    kd_soft_and_hard,
    make_eval_step,
    make_optimizer,
    make_train_step,
    mask_grads,
    restore_frozen,
    soft_ce,
    wd_mask,
)

TINY = DeiTConfig(img_size=32, patch_size=8, embed_dim=24, depth=2,
                  num_heads=3, num_classes=10)


def build(policy):
    model = VisionTransformer(cfg=TINY, policy=policy)
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init({"params": jax.random.key(0)}, x)
    return model, params


class TestLosses:
    def test_soft_ce_identical_logits(self):
        # CE(p, p) = entropy of p > 0; grad wrt student is 0 at equality
        logits = jnp.asarray(np.random.default_rng(0).normal(size=(4, 10)),
                             jnp.float32)
        val = soft_ce(logits, logits)
        p = jax.nn.softmax(logits)
        want = -jnp.mean(jnp.sum(p * jnp.log(p), axis=-1))
        np.testing.assert_allclose(float(val), float(want), rtol=1e-5)

    def test_hard_ce_matches_manual(self):
        logits = jnp.asarray([[2.0, 0.0, 0.0], [0.0, 3.0, 0.0]])
        labels = jnp.asarray([0, 1])
        want = -np.mean([
            2.0 - np.log(np.exp(2) + 2),
            3.0 - np.log(np.exp(3) + 2),
        ])
        np.testing.assert_allclose(float(hard_ce(logits, labels)), want, rtol=1e-6)

    def test_hard_ce_soft_targets(self):
        logits = jnp.asarray([[1.0, 0.0]])
        target = jnp.asarray([[0.7, 0.3]])
        lp = jax.nn.log_softmax(logits)
        want = -(0.7 * lp[0, 0] + 0.3 * lp[0, 1])
        np.testing.assert_allclose(float(hard_ce(logits, target)), float(want),
                                   rtol=1e-6)

    def test_kd_soft_and_hard_tuple(self):
        cls = jnp.asarray([[1.0, 0.0]])
        dist = jnp.asarray([[0.0, 1.0]])
        teacher = jnp.asarray([[0.5, 0.5]])
        label = jnp.asarray([0])
        got = kd_soft_and_hard((cls, dist), label, teacher)
        want = soft_ce(dist, teacher) + hard_ce(cls, label)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


class TestSchedule:
    def test_phases(self):
        fn = cosine_with_warmup_cooldown(
            1e-3, epochs=100, warmup_epochs=10, warmup_lr=1e-6, min_lr=1e-5)
        assert float(fn(0)) == pytest.approx(1e-6)
        assert float(fn(5)) == pytest.approx(1e-6 + (1e-3 - 1e-6) * 0.5)
        # at t=10, cosine(10/100): min + 0.5*(base-min)*(1+cos(0.1*pi))
        want = 1e-5 + 0.5 * (1e-3 - 1e-5) * (1 + np.cos(0.1 * np.pi))
        assert float(fn(10)) == pytest.approx(want, rel=1e-5)
        assert float(fn(100)) == pytest.approx(1e-5)   # cooldown
        assert float(fn(130)) == pytest.approx(1e-5)

    def test_cga_finetune_starts_at_cooldown(self):
        # cga.py:760 jumps start_epoch past the cosine: LR == min_lr there
        fn = cosine_with_warmup_cooldown(
            5.47e-4, epochs=300, warmup_epochs=5, warmup_lr=1e-6, min_lr=1e-5)
        assert float(fn(300)) == pytest.approx(1e-5)


class TestOptim:
    def test_wd_mask_excludes_embeddings_and_1d(self):
        pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                               qmodules=default_deit_qmodules(2))
        _, params = build(pol)
        mask = wd_mask(params["params"])
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        for path, decayed in flat:
            names = [getattr(p, "key", "") for p in path]
            leaf_shape = None
            if "pos_embed" in names or "cls_token" in names or "dist_token" in names:
                assert not decayed, names
            if names[-1] == "bias" or names[-1] == "s":
                assert not decayed, names
            if names[-1] == "kernel":
                assert decayed, names

    def test_adamw_step_changes_params(self):
        pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                               qmodules=default_deit_qmodules(2))
        model, params = build(pol)
        tx = make_optimizer(lambda _: 1e-3, weight_decay=0.05)
        state = TrainState.create(params, tx)
        step = jax.jit(make_train_step(model, tx, loss_kind="ce"))
        batch = {
            "image": jnp.asarray(
                np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                jnp.float32),
            "label": jnp.asarray([1, 2]),
        }
        new_state, metrics = step(state, batch, jax.random.key(0))
        assert float(metrics["loss"]) > 0
        assert int(new_state.step) == 1
        # params moved
        diff = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state.params["params"], new_state.params["params"])
        assert max(jax.tree.leaves(diff)) > 0


class TestCGA:
    def test_kernel_selection_deit(self):
        pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                               qmodules=default_deit_qmodules(2),
                               qk_reparam=True, qk_reparam_type=1)
        _, params = build(pol)
        masks = freeze_masks(params["params"], bits=2, boundary_range=0.005,
                             qk_reparam=True)
        flat = jax.tree_util.tree_flatten_with_path(
            masks, is_leaf=lambda x: x is None)[0]
        selected = [
            "/".join(getattr(p, "key", "") for p in path)
            for path, m in flat if m is not None
        ]
        # per block: fc1, fc2, proj kernels + v_kernel = 4; depth 2 -> 8
        assert len(selected) == 8
        assert any("v_kernel" in s for s in selected)
        assert not any("q_kernel" in s for s in selected)
        assert not any("head" in s for s in selected)
        assert not any("patch_embed" in s for s in selected)

    def test_kernel_selection_nonreparam_includes_qkv(self):
        pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                               qmodules=default_deit_qmodules(2))
        _, params = build(pol)
        masks = freeze_masks(params["params"], bits=2, boundary_range=0.005,
                             qk_reparam=False)
        flat = jax.tree_util.tree_flatten_with_path(
            masks, is_leaf=lambda x: x is None)[0]
        selected = [
            "/".join(getattr(p, "key", "") for p in path)
            for path, m in flat if m is not None
        ]
        assert len(selected) == 8  # fc1, fc2, qkv, proj per block
        assert any("qkv" in s for s in selected)

    def test_mask_and_restore_roundtrip(self):
        pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                               qmodules=default_deit_qmodules(2))
        _, params = build(pol)
        p = params["params"]
        masks = freeze_masks(p, bits=2, boundary_range=0.005, qk_reparam=False)
        grads = jax.tree.map(jnp.ones_like, p)
        mg = mask_grads(grads, masks)
        # frozen weights (mask==1) must have zero grad
        qkv_mask = masks["blocks_0"]["attn"]["qkv"]["kernel"]
        qkv_grad = mg["blocks_0"]["attn"]["qkv"]["kernel"]
        np.testing.assert_allclose(
            np.asarray(qkv_grad), np.asarray(1.0 - qkv_mask))
        # restore: pretend optimizer moved everything by +1
        moved = jax.tree.map(lambda x: x + 1.0, p)
        restored = restore_frozen(p, moved, masks)
        r = restored["blocks_0"]["attn"]["qkv"]["kernel"]
        w0 = p["blocks_0"]["attn"]["qkv"]["kernel"]
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(w0 + (1.0 - qkv_mask)), rtol=1e-6)
        # non-selected leaves pass through
        np.testing.assert_allclose(
            np.asarray(restored["pos_embed"]), np.asarray(p["pos_embed"] + 1.0))

    def test_cga_train_step_freezes(self):
        pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                               qmodules=default_deit_qmodules(2),
                               qk_reparam=True, qk_reparam_type=1)
        model, params = build(pol)
        tx = make_optimizer(lambda _: 1e-2, weight_decay=0.05)
        state = TrainState.create(params, tx)
        step = jax.jit(make_train_step(
            model, tx, loss_kind="ce",
            cga=dict(bits=2, boundary_range=0.005, qk_reparam=True)))
        batch = {
            "image": jnp.asarray(
                np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                jnp.float32),
            "label": jnp.asarray([1, 2]),
        }
        masks = freeze_masks(state.params["params"], bits=2,
                             boundary_range=0.005, qk_reparam=True)
        new_state, _ = step(state, batch, jax.random.key(0))
        w0 = state.params["params"]["blocks_0"]["mlp"]["fc1"]["kernel"]
        w1 = new_state.params["params"]["blocks_0"]["mlp"]["fc1"]["kernel"]
        m = masks["blocks_0"]["mlp"]["fc1"]["kernel"]
        frozen_delta = np.abs(np.asarray((w1 - w0) * m)).max()
        live_delta = np.abs(np.asarray((w1 - w0) * (1 - m))).max()
        assert frozen_delta == 0.0
        assert live_delta > 0.0


class TestEval:
    def test_eval_counts(self):
        model, params = build(policy_from_args(
            wq_bitw=2, aq_bitw=2, qmodules=default_deit_qmodules(2)))
        ev = jax.jit(make_eval_step(model))
        batch = {
            "image": jnp.asarray(
                np.random.default_rng(0).normal(size=(4, 32, 32, 3)),
                jnp.float32),
            "label": jnp.asarray([0, 1, 2, 3]),
        }
        out = ev(params["params"], batch)
        assert int(out["count"]) == 4
        assert 0 <= int(out["correct1"]) <= int(out["correct5"]) <= 4


class TestBatchNormSwap:
    def test_bn_model_trains_and_updates_stats(self):
        import dataclasses as dc

        cfg = dc.replace(TINY, norm_layer="batchnorm")
        pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                               qmodules=default_deit_qmodules(2))
        model = VisionTransformer(cfg=cfg, policy=pol)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                        jnp.float32)
        variables = model.init({"params": jax.random.key(0)}, x)
        assert "batch_stats" in variables
        tx = make_optimizer(lambda _: 1e-3)
        state = TrainState.create(variables, tx)
        step = jax.jit(make_train_step(model, tx, loss_kind="ce"))
        batch = {"image": x, "label": jnp.asarray([1, 2])}
        new_state, metrics = step(state, batch, jax.random.key(0))
        assert bool(jnp.isfinite(metrics["loss"]))
        # running stats moved
        m0 = jax.tree.leaves(state.params["batch_stats"])[0]
        m1 = jax.tree.leaves(new_state.params["batch_stats"])[0]
        assert float(jnp.max(jnp.abs(m1 - m0))) > 0
        # eval uses running stats via the full variables dict
        ev = jax.jit(make_eval_step(model))
        out = ev(new_state.params, batch)
        assert int(out["count"]) == 2


class TestTokenKD:
    def test_kd_token_step(self):
        import dataclasses as dc

        cfg = dc.replace(TINY, return_features=True)
        pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                               qmodules=default_deit_qmodules(2))
        student = VisionTransformer(cfg=cfg, policy=pol)
        teacher = VisionTransformer(cfg=cfg)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                        jnp.float32)
        sp = student.init({"params": jax.random.key(0)}, x)
        tp = teacher.init({"params": jax.random.key(1)}, x)["params"]
        tx = make_optimizer(lambda _: 1e-3)
        state = TrainState.create(sp, tx)
        step = jax.jit(make_train_step(
            student, tx, teacher=teacher, loss_kind="kd_token",
            token_kd_alpha=0.5, token_kd_type="all"))
        batch = {"image": x, "label": jnp.asarray([1, 2])}
        new_state, metrics = step(state, batch, jax.random.key(2), tp)
        assert bool(jnp.isfinite(metrics["loss"]))
        assert float(metrics["loss"]) > 0


class TestQkKD:
    def test_kd_qk_step_with_gram_distillation(self):
        import dataclasses as dc

        cfg = dc.replace(TINY, qqkkvv=True)
        pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                               qmodules=default_deit_qmodules(2))
        student = VisionTransformer(cfg=cfg, policy=pol)
        teacher = VisionTransformer(cfg=cfg)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                        jnp.float32)
        sp = student.init({"params": jax.random.key(0)}, x)
        tp = teacher.init({"params": jax.random.key(1)}, x)["params"]
        tx = make_optimizer(lambda _: 1e-3)
        state = TrainState.create(sp, tx)
        for kind in ("kd_qk", "kd_qkv"):
            step = jax.jit(make_train_step(
                student, tx, teacher=teacher, loss_kind=kind))
            batch = {"image": x, "label": jnp.asarray([1, 2])}
            _, metrics = step(state, batch, jax.random.key(2), tp)
            assert bool(jnp.isfinite(metrics["loss"])), kind
            assert float(metrics["loss"]) > 0
