"""Loss fuzz-differential vs the ACTUAL reference loss classes.

The loss zoo (ofq_tpu/train/losses.py) had golden/manual tests only;
this file drives the genuine torch classes from
src/quantization/utils.py with the same random inputs and compares the
scalar loss AND the gradients w.r.t. every student-side input — the
quantities that actually steer training.  Covers KLLossSoft (incl.
temperature and the tuple-unwrap branch), KDLossSoftandHard,
KDLossSoftandHard_qk/_qkv (per-layer Gram direction matching with the
<= -1e2 masking branch) and KLTokenMSELoss (kd_type last/all, student
prefix-token slicing).  AGC already has its own differential suite
(test_torch_differential.py::TestAgcDifferential).
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import jax
import jax.numpy as jnp

import reference_loader as rl

rl.install()

from ofq_tpu.train.losses import (  # noqa: E402
    kd_soft_and_hard,
    kd_soft_hard_qk,
    kl_token_mse,
    soft_ce,
)

B, C = 4, 10


def _rand(rng, *shape):
    return rng.normal(size=shape).astype(np.float32) * 2.0


class TestKLLossSoft:
    @pytest.mark.parametrize("seed,temperature", [(0, 1.0), (1, 2.0),
                                                  (2, 0.5)])
    def test_value_and_grad(self, seed, temperature):
        import torch

        from src.quantization.utils import KLLossSoft

        rng = np.random.default_rng(seed)
        s_np, t_np = _rand(rng, B, C), _rand(rng, B, C)

        s_t = torch.tensor(s_np, requires_grad=True)
        loss_t = KLLossSoft()(s_t, torch.tensor(t_np), T=temperature)
        loss_t.backward()

        f = lambda s: soft_ce(s, jnp.asarray(t_np), temperature)
        loss_j, grad_j = jax.value_and_grad(f)(jnp.asarray(s_np))
        np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(grad_j),
                                   s_t.grad.numpy(), rtol=1e-5, atol=1e-7)

    def test_tuple_unwrap_branch(self):
        """The reference unwraps tuples to their FIRST element
        (utils.py:46-47) — drive it with tuple inputs and match."""
        import torch

        from src.quantization.utils import KLLossSoft

        rng = np.random.default_rng(3)
        s_np, t_np, junk = _rand(rng, B, C), _rand(rng, B, C), _rand(
            rng, B, C)
        s_t = torch.tensor(s_np, requires_grad=True)
        loss_t = KLLossSoft()((s_t, torch.tensor(junk)),
                              (torch.tensor(t_np), torch.tensor(junk)))
        loss_t.backward()
        loss_j, grad_j = jax.value_and_grad(
            lambda s: soft_ce(s, jnp.asarray(t_np)))(jnp.asarray(s_np))
        np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(grad_j), s_t.grad.numpy(),
                                   rtol=1e-5, atol=1e-7)


class TestKDLossSoftandHard:
    @pytest.mark.parametrize("seed,distilled", [(0, True), (1, False)])
    def test_value_and_grads(self, seed, distilled):
        import torch

        from src.quantization.utils import KDLossSoftandHard

        rng = np.random.default_rng(10 + seed)
        cls_np, dist_np = _rand(rng, B, C), _rand(rng, B, C)
        teach_np = _rand(rng, B, C)
        labels = rng.integers(0, C, size=B)

        cls_t = torch.tensor(cls_np, requires_grad=True)
        dist_t = torch.tensor(dist_np, requires_grad=True)
        out = (cls_t, dist_t) if distilled else cls_t
        loss_t = KDLossSoftandHard()(out, torch.tensor(labels),
                                     torch.tensor(teach_np))
        loss_t.backward()

        if distilled:
            f = lambda c, d: kd_soft_and_hard(
                (c, d), jnp.asarray(labels), jnp.asarray(teach_np))
            loss_j, (gc, gd) = jax.value_and_grad(f, argnums=(0, 1))(
                jnp.asarray(cls_np), jnp.asarray(dist_np))
            np.testing.assert_allclose(np.asarray(gd),
                                       dist_t.grad.numpy(), rtol=1e-5,
                                       atol=1e-7)
        else:
            f = lambda c: kd_soft_and_hard(
                c, jnp.asarray(labels), jnp.asarray(teach_np))
            loss_j, gc = jax.value_and_grad(f)(jnp.asarray(cls_np))
        np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gc), cls_t.grad.numpy(),
                                   rtol=1e-5, atol=1e-7)


class TestQkDirectionKD:
    @pytest.mark.parametrize("seed,include_v,masked", [
        (0, False, False), (1, True, False), (2, False, True),
        (3, True, True),
    ])
    def test_value_and_gram_grads(self, seed, include_v, masked):
        """KDLossSoftandHard_qk/_qkv: per-layer (attn, qqT, kkT, vvT)
        Gram lists; `masked` plants <= -1e2 entries to exercise the
        zeroing branch (utils.py:175-180)."""
        import torch

        from src.quantization.utils import (
            KDLossSoftandHard_qk,
            KDLossSoftandHard_qkv,
        )

        rng = np.random.default_rng(20 + seed)
        H, N = 3, 7
        layers = 2
        cls_np, dist_np = _rand(rng, B, C), _rand(rng, B, C)
        teach_np = _rand(rng, B, C)
        labels = rng.integers(0, C, size=B)

        def gram():
            g = _rand(rng, B, H, N, N)
            if masked:
                g[rng.random(size=g.shape) < 0.1] = -1e4
            return g

        s_info_np = [tuple(gram() for _ in range(4)) for _ in range(layers)]
        t_info_np = [tuple(gram() for _ in range(4)) for _ in range(layers)]

        cls_t = torch.tensor(cls_np, requires_grad=True)
        dist_t = torch.tensor(dist_np, requires_grad=True)
        s_info_t = [tuple(torch.tensor(a, requires_grad=True) for a in lay)
                    for lay in s_info_np]
        t_info_t = [tuple(torch.tensor(a) for a in lay)
                    for lay in t_info_np]
        klass = KDLossSoftandHard_qkv if include_v else KDLossSoftandHard_qk
        loss_t = klass()((cls_t, dist_t), s_info_t, torch.tensor(labels),
                         torch.tensor(teach_np), t_info_t)
        loss_t.backward()

        def f(c, d, s_info):
            return kd_soft_hard_qk(
                (c, d), s_info, jnp.asarray(labels), jnp.asarray(teach_np),
                jax.tree.map(jnp.asarray, t_info_np), include_v=include_v)

        loss_j, (gc, gd, ginfo) = jax.value_and_grad(f, argnums=(0, 1, 2))(
            jnp.asarray(cls_np), jnp.asarray(dist_np),
            jax.tree.map(jnp.asarray, s_info_np))
        np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gc), cls_t.grad.numpy(),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(gd), dist_t.grad.numpy(),
                                   rtol=1e-5, atol=1e-7)
        for lay in range(layers):
            used = (1, 2, 3) if include_v else (1, 2)
            for slot in range(4):
                g_t = s_info_t[lay][slot].grad
                g_j = np.asarray(ginfo[lay][slot])
                if slot in used:
                    np.testing.assert_allclose(
                        g_j, g_t.numpy(), rtol=1e-4, atol=1e-7,
                        err_msg=f"layer {lay} slot {slot}")
                else:
                    # attn slot 0 (and v when not included) must carry NO
                    # gradient in either framework
                    assert g_t is None or not g_t.abs().any()
                    assert not np.abs(g_j).any()


class TestKLTokenMSE:
    @pytest.mark.parametrize("seed,kd_type,as_list,extra_prefix", [
        (0, "last", False, 2),   # student has 2 extra prefix tokens
        (1, "last", True, 1),
        (2, "all", True, 2),
        (3, "all", True, 0),
    ])
    def test_value_and_grads(self, seed, kd_type, as_list, extra_prefix):
        import torch

        from src.quantization.utils import KLTokenMSELoss

        rng = np.random.default_rng(30 + seed)
        N, D = 6, 8
        layers = 3 if kd_type == "all" else 1
        logit_np, teach_np = _rand(rng, B, C), _rand(rng, B, C)
        s_tok_np = [_rand(rng, B, N + extra_prefix, D) for _ in range(layers)]
        t_tok_np = [_rand(rng, B, N, D) for _ in range(layers)]

        logit_t = torch.tensor(logit_np, requires_grad=True)
        s_tok_t = [torch.tensor(a, requires_grad=True) for a in s_tok_np]
        if as_list:
            out_tokens, tgt_tokens = s_tok_t, [torch.tensor(a)
                                               for a in t_tok_np]
        else:
            out_tokens, tgt_tokens = s_tok_t[0], torch.tensor(t_tok_np[0])
        loss_t = KLTokenMSELoss(alpha=0.5, kd_type=kd_type)(
            (logit_t, out_tokens), (torch.tensor(teach_np), tgt_tokens))
        loss_t.backward()

        def f(logits, toks):
            return kl_token_mse(
                logits, toks if as_list else toks[0],
                jnp.asarray(teach_np), jax.tree.map(jnp.asarray, t_tok_np)
                if as_list else jnp.asarray(t_tok_np[0]),
                alpha=0.5, kd_type=kd_type)

        loss_j, (gl, gt) = jax.value_and_grad(f, argnums=(0, 1))(
            jnp.asarray(logit_np), [jnp.asarray(a) for a in s_tok_np])
        np.testing.assert_allclose(float(loss_j), loss_t.item(), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gl), logit_t.grad.numpy(),
                                   rtol=1e-5, atol=1e-7)
        checked = range(layers) if as_list else [0]
        for i in checked:
            np.testing.assert_allclose(
                np.asarray(gt[i]), s_tok_t[i].grad.numpy(), rtol=1e-5,
                atol=1e-7, err_msg=f"token layer {i}")
