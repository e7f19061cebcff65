"""Randomized quantizer fuzz-differential vs the ACTUAL reference code.

The fixed-shape torch-differential tests (test_torch_differential.py)
pin the shipped recipes; this file fuzzes the quantizer PRIMITIVES over
random shapes x bit-widths x ranges, comparing values AND gradients
against the reference modules (src/quantization/quantizer/{lsq,statsq})
running under reference_loader's CPU shims.  Axis-convention mistakes
(the class of bug the round-3 AGC finding belonged to) are exactly what
this catches: every reference scale/group convention must reproduce
under the (in, out)/natural layouts this repo uses.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import jax
import jax.numpy as jnp

import reference_loader as rl

rl.install()


def _torch_value_and_grads(module, x_np, cot_np, s_attr="s"):
    import torch

    x = torch.tensor(x_np, requires_grad=True)
    y = module(x)  # lazy init on first forward (LSQ)
    if x.grad is not None:
        x.grad = None
    y.backward(torch.tensor(cot_np))
    s = getattr(module, s_attr, None)
    ds = (s.grad.detach().numpy()
          if s is not None and getattr(s, "grad", None) is not None else None)
    return (y.detach().numpy(), x.grad.detach().numpy(), ds)


class TestStatsQFuzz:
    @pytest.mark.parametrize("seed,bits,shape", [
        (0, 2, (8, 16)), (1, 3, (48, 24)), (2, 4, (5, 7)),
        (3, 2, (33, 129)), (4, 4, (128, 3)),
    ])
    def test_2d_value_and_grad(self, seed, bits, shape):
        from src.quantization.quantizer.statsq import StatsQuantizer

        from ofq_tpu.quant.statsq import statsq_quantize

        rng = np.random.default_rng(seed)
        # torch (out, in); ours is the transpose (in, out)
        w_t = (rng.normal(size=shape) * rng.uniform(0.2, 3)).astype(np.float32)
        cot = rng.normal(size=shape).astype(np.float32)
        y_t, dx_t, _ = _torch_value_and_grads(
            StatsQuantizer(bits, clip_learnable=False), w_t, cot)

        f = lambda w: statsq_quantize(w, bits)
        y_j, vjp = jax.vjp(f, jnp.asarray(w_t.T))
        (dx_j,) = vjp(jnp.asarray(cot.T))
        np.testing.assert_allclose(np.asarray(y_j).T, y_t, rtol=1e-6,
                                   atol=1e-6)
        # STE: gradient is exactly the cotangent
        np.testing.assert_array_equal(np.asarray(dx_j).T, dx_t)

    @pytest.mark.parametrize("seed,bits,shape", [
        (5, 2, (4, 9, 6)), (6, 3, (2, 33, 17)),
    ])
    def test_3d_value(self, seed, bits, shape):
        """The reference 3-D branch: scale = 2*mean over dims (0, -1),
        keepdim (1, dim, 1) — our reduce_axis must reproduce it."""
        from src.quantization.quantizer.statsq import StatsQuantizer

        from ofq_tpu.quant.statsq import statsq_scale

        rng = np.random.default_rng(seed)
        w = rng.normal(size=shape).astype(np.float32)
        import torch

        m = StatsQuantizer(bits, clip_learnable=False)
        y_t = m(torch.tensor(w)).detach().numpy()
        # reproduce with our primitives: per-middle-axis scale
        s = 2.0 * np.mean(np.abs(w), axis=(0, 2), keepdims=True)
        np.testing.assert_allclose(
            np.asarray(statsq_scale(jnp.asarray(w).transpose(1, 0, 2)
                                    .reshape(shape[1], -1),
                                    reduce_axis=-1)).ravel(),
            s.ravel(), rtol=1e-6)
        n = float(2 ** (bits - 1))
        clipped = np.clip(w / s, -1.0, 1.0 - 1e-6)
        q = s * ((np.round(clipped * n - 0.5) + 0.5) / n)
        np.testing.assert_allclose(y_t, q, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("seed,bits,shape", [
        (7, 2, (2, 3, 9, 6)), (8, 3, (1, 6, 49, 32)), (9, 4, (4, 2, 5, 7)),
    ])
    def test_4d_value_and_grad(self, seed, bits, shape):
        """StatsQuantizer_4d (statsq.py:196-219): one scale per axis-2
        slice of a (B, H, N, D) tensor — same layout both sides, so the
        comparison is transpose-free; gradient is pure STE."""
        from src.quantization.quantizer.statsq import StatsQuantizer_4d

        from ofq_tpu.quant.statsq import statsq_quantize_4d

        rng = np.random.default_rng(300 + seed)
        w_np = (rng.normal(size=shape) * rng.uniform(0.2, 3)).astype(
            np.float32)
        cot = rng.normal(size=shape).astype(np.float32)
        y_t, dx_t, _ = _torch_value_and_grads(
            StatsQuantizer_4d(bits, clip_learnable=False), w_np, cot)

        f = lambda w: statsq_quantize_4d(w, bits)
        y_j, vjp = jax.vjp(f, jnp.asarray(w_np))
        (dx_j,) = vjp(jnp.asarray(cot))
        np.testing.assert_allclose(np.asarray(y_j), y_t, rtol=1e-6,
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(dx_j), dx_t)


class TestEdgeLsqFuzz:
    """The W8A8-edge quantizer variants (head weight / head input /
    patch-embed image / conv weight).  Full-model differential parity
    covers their forward values transitively; these compare the VJPs —
    dx and the learned-scale gradient with each variant's idiosyncratic
    grad factor — against the torch modules directly."""

    @pytest.mark.parametrize("seed,bits,shape", [
        (0, 8, (10, 24)), (1, 4, (7, 33)), (2, 2, (128, 5)),
    ])
    def test_weight_per_row(self, seed, bits, shape):
        """LsqQuantizerWeight (lsq.py:20-109): torch (out, in) with one
        scale per row, grad factor 1/sqrt(thd_pos * in) — our (in, out)
        transpose with channel_axis=-1."""
        from src.quantization.quantizer.lsq import LsqQuantizerWeight

        from ofq_tpu.quant.lsq import lsq_quantize

        rng = np.random.default_rng(500 + seed)
        w_t = (rng.normal(size=shape) * rng.uniform(0.2, 2)).astype(
            np.float32)
        cot = rng.normal(size=shape).astype(np.float32)
        m = LsqQuantizerWeight(bits, per_channel=True, learnable=True)
        y_t, dx_t, ds_t = _torch_value_and_grads(m, w_t, cot)
        s0 = m.s.detach().numpy().copy()

        f = lambda w, s: lsq_quantize(w, s, bits, channel_axis=-1)
        y_j, vjp = jax.vjp(f, jnp.asarray(w_t.T), jnp.asarray(s0))
        dx_j, ds_j = vjp(jnp.asarray(cot.T))
        np.testing.assert_allclose(np.asarray(y_j).T, y_t, rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(dx_j).T, dx_t, rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(ds_j), ds_t, rtol=1e-4,
                                   atol=1e-6)

    @pytest.mark.parametrize("seed,bits,shape", [
        (0, 8, (4, 37)), (1, 4, (2, 9, 11)),
    ])
    def test_head_input_per_tensor(self, seed, bits, shape):
        """LsqQuantizer4head_input (lsq.py:448-513): one scalar scale,
        grad factor 1/sqrt(thd_pos * numel) — channel_axis=None."""
        from src.quantization.quantizer.lsq import LsqQuantizer4head_input

        from ofq_tpu.quant.lsq import lsq_quantize

        rng = np.random.default_rng(600 + seed)
        x_np = (rng.normal(size=shape) * rng.uniform(0.3, 2)).astype(
            np.float32)
        cot = rng.normal(size=shape).astype(np.float32)
        m = LsqQuantizer4head_input(bits, learnable=True)
        y_t, dx_t, ds_t = _torch_value_and_grads(m, x_np, cot)
        s0 = m.s.detach().numpy().copy()

        f = lambda x, s: lsq_quantize(x, s, bits, channel_axis=None)
        y_j, vjp = jax.vjp(f, jnp.asarray(x_np), jnp.asarray(s0))
        dx_j, ds_j = vjp(jnp.asarray(cot))
        np.testing.assert_allclose(np.asarray(y_j), y_t, rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(dx_j), dx_t, rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(ds_j), ds_t, rtol=1e-4,
                                   atol=1e-6)

    @pytest.mark.parametrize("seed,bits,signed,shape", [
        (0, 8, True, (2, 3, 8, 8)),    # NCHW in torch
        (1, 8, False, (3, 3, 6, 10)),  # all-positive -> unsigned range
        (2, 4, True, (2, 5, 7, 7)),
    ])
    def test_img_per_channel_dynamic_signed(self, seed, bits, signed,
                                            shape):
        """LsqQuantizer4img (lsq.py:306-382): per-channel scale on NCHW
        dim 1, grad factor 1/sqrt(thd_pos * B*H*W), signed/unsigned range
        picked by the data — our NHWC layout with the traced signedness
        flag."""
        from src.quantization.quantizer.lsq import LsqQuantizer4img

        from ofq_tpu.quant.lsq import lsq_quantize_dynamic_signed

        rng = np.random.default_rng(700 + seed)
        x_t = (rng.normal(size=shape) * rng.uniform(0.3, 2)).astype(
            np.float32)
        if not signed:
            x_t = np.abs(x_t)
        cot = rng.normal(size=shape).astype(np.float32)
        m = LsqQuantizer4img(bits, learnable=True)
        y_t, dx_t, ds_t = _torch_value_and_grads(m, x_t, cot)
        assert bool(m.signed.item() != 0) == signed  # autodetect fired
        s0 = m.s.detach().numpy().copy()

        to_nhwc = lambda a: a.transpose(0, 2, 3, 1)
        f = lambda x, s: lsq_quantize_dynamic_signed(
            x, s, bits, jnp.asarray(signed), channel_axis=-1)
        y_j, vjp = jax.vjp(f, jnp.asarray(to_nhwc(x_t)), jnp.asarray(s0))
        dx_j, ds_j = vjp(jnp.asarray(to_nhwc(cot)))
        np.testing.assert_allclose(np.asarray(y_j), to_nhwc(y_t),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dx_j), to_nhwc(dx_t),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ds_j), ds_t, rtol=1e-4,
                                   atol=1e-6)

    @pytest.mark.parametrize("seed,bits,shape", [
        (0, 8, (12, 3, 4, 4)),   # (O, I, kh, kw) in torch
        (1, 4, (5, 7, 3, 3)),
    ])
    def test_conv_weight_per_out_channel(self, seed, bits, shape):
        """LsqQuantizer4Conv2d (lsq.py:384-446): one scale per output
        channel (OIHW dim 0), grad factor 1/sqrt(thd_pos * I*kh*kw) —
        our HWIO layout with channel_axis=-1."""
        from src.quantization.quantizer.lsq import LsqQuantizer4Conv2d

        from ofq_tpu.quant.lsq import lsq_quantize

        rng = np.random.default_rng(800 + seed)
        w_t = (rng.normal(size=shape) * rng.uniform(0.2, 2)).astype(
            np.float32)
        cot = rng.normal(size=shape).astype(np.float32)
        m = LsqQuantizer4Conv2d(bits, learnable=True)
        y_t, dx_t, ds_t = _torch_value_and_grads(m, w_t, cot)
        s0 = m.s.detach().numpy().copy()

        to_hwio = lambda a: a.transpose(2, 3, 1, 0)
        f = lambda w, s: lsq_quantize(w, s, bits, channel_axis=-1)
        y_j, vjp = jax.vjp(f, jnp.asarray(to_hwio(w_t)), jnp.asarray(s0))
        dx_j, ds_j = vjp(jnp.asarray(to_hwio(cot)))
        np.testing.assert_allclose(np.asarray(y_j), to_hwio(y_t),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dx_j), to_hwio(dx_t),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ds_j), ds_t, rtol=1e-4,
                                   atol=1e-6)


class TestTrackOscillationFuzz:
    @pytest.mark.parametrize("seed,momentum,threshold,use_ema", [
        (0, 0.30, 0.0, True),    # tracking only (frozen stays None in torch)
        (1, 0.30, 0.5, True),    # freezing via round(ema_x_int)
        (2, 0.25, 0.6, False),   # freezing via the current x_int
        (3, 0.40, 0.5, True),
    ])
    def test_step_by_step_vs_reference(self, seed, momentum, threshold,
                                       use_ema):
        """TrackOscillation (lsq.py:111-200): drive BOTH trackers through
        the same random integer-domain sequence and compare the full
        visible state every step — returned (possibly frozen) x_int,
        ema_oscillation, total_oscillation, prev_switch_dir, and the
        frozen mask/values once the threshold path is active.  The torch
        module's first call is its lazy init (delta == 0 by
        construction); ours takes the same tensor via
        init_oscillation_state, so the sequences align exactly."""
        import torch

        from src.quantization.quantizer.lsq import TrackOscillation

        from ofq_tpu.quant.oscillation import (
            init_oscillation_state,
            track_oscillation,
        )

        rng = np.random.default_rng(400 + seed)
        shape = (16, 8)
        steps = 40
        # small integer levels with frequent +/-1 flips so oscillations
        # actually cross the freeze threshold within 40 steps
        seq = rng.integers(-2, 3, size=(steps + 1,) + shape).astype(
            np.float32)

        m = TrackOscillation(momentum=momentum, freeze_threshold=threshold,
                             use_ema_x_int=use_ema)
        y0 = m(torch.tensor(seq[0]))  # lazy init call: delta == 0
        np.testing.assert_array_equal(y0.numpy(), seq[0])

        st = init_oscillation_state(jnp.asarray(seq[0]))
        step = jax.jit(lambda x, s: track_oscillation(
            x, s, momentum=momentum, freeze_threshold=threshold,
            use_ema_x_int=use_ema))

        for t in range(1, steps + 1):
            y_t = m(torch.tensor(seq[t]))
            y_j, st = step(jnp.asarray(seq[t]), st)
            np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(),
                                       rtol=0, atol=1e-6, err_msg=f"t={t}")
            np.testing.assert_allclose(
                np.asarray(st.ema_oscillation),
                m.ema_oscillation.numpy(), rtol=1e-5, atol=1e-6,
                err_msg=f"t={t}")
            np.testing.assert_allclose(
                np.asarray(st.total_oscillation),
                m.total_oscillation.numpy(), rtol=0, atol=0,
                err_msg=f"t={t}")
            np.testing.assert_array_equal(
                np.asarray(st.prev_switch_dir),
                m.prev_switch_dir.numpy(), err_msg=f"t={t}")
            if threshold > 0:
                np.testing.assert_array_equal(
                    np.asarray(st.frozen), m.frozen.numpy(),
                    err_msg=f"t={t}")
                np.testing.assert_allclose(
                    np.asarray(st.frozen_x_int),
                    m.frozen_x_int.numpy(), rtol=0, atol=1e-6,
                    err_msg=f"t={t}")
        if threshold > 0:
            # the scenario must actually exercise freezing to be a test
            assert bool(np.asarray(st.frozen).any()), \
                "no weight froze — sequence too tame for the threshold"


class TestLsqFuzz:
    @pytest.mark.parametrize("seed,bits,all_positive,shape", [
        (0, 2, False, (4, 9, 12)),    # (B, N, C) per-token
        (1, 3, False, (2, 17, 5)),
        (2, 4, True, (3, 8, 16)),     # unsigned (post-softmax/fc2 ranges)
        (3, 8, False, (2, 5, 7)),
        (4, 2, False, (2, 3, 11, 6)),  # (B, H, N, d) 4-D per-token branch
        (5, 4, True, (2, 2, 9, 8)),
    ])
    def test_per_token_value_and_grads(self, seed, bits, all_positive,
                                       shape):
        """LsqQuantizer (axis -2): values, dx AND the learned-scale
        gradient (incl. the reference's idiosyncratic per-shape
        grad-scale factor) must match the torch module exactly."""
        from src.quantization.quantizer.lsq import LsqQuantizer

        from ofq_tpu.quant.lsq import lsq_quantize

        rng = np.random.default_rng(100 + seed)
        x_np = (rng.normal(size=shape) * rng.uniform(0.3, 2)).astype(
            np.float32)
        if all_positive:
            x_np = np.abs(x_np)
        cot = rng.normal(size=shape).astype(np.float32)

        m = LsqQuantizer(bits, all_positive=all_positive, per_channel=True,
                         learnable=True)
        y_t, dx_t, ds_t = _torch_value_and_grads(m, x_np, cot)
        s0 = m.s.detach().numpy().copy()

        f = lambda x, s: lsq_quantize(x, s, bits,
                                      all_positive=all_positive,
                                      channel_axis=-2)
        y_j, vjp = jax.vjp(f, jnp.asarray(x_np), jnp.asarray(s0))
        dx_j, ds_j = vjp(jnp.asarray(cot))
        np.testing.assert_allclose(np.asarray(y_j), y_t, rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(dx_j), dx_t, rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(ds_j), ds_t, rtol=1e-4,
                                   atol=1e-6)

    @pytest.mark.parametrize("seed,bits,shape", [
        (0, 2, (4, 9, 12)), (1, 4, (2, 17, 6)),
    ])
    def test_per_channel_4v_value_and_grads(self, seed, bits, shape):
        """LsqQuantizer4v (axis -1, true per-channel)."""
        from src.quantization.quantizer.lsq import LsqQuantizer4v

        from ofq_tpu.quant.lsq import lsq_quantize

        rng = np.random.default_rng(200 + seed)
        x_np = rng.normal(size=shape).astype(np.float32)
        cot = rng.normal(size=shape).astype(np.float32)
        m = LsqQuantizer4v(bits, all_positive=False, per_channel=True,
                           learnable=True)
        y_t, dx_t, ds_t = _torch_value_and_grads(m, x_np, cot)
        s0 = m.s.detach().numpy().copy()

        f = lambda x, s: lsq_quantize(x, s, bits, channel_axis=-1)
        y_j, vjp = jax.vjp(f, jnp.asarray(x_np), jnp.asarray(s0))
        dx_j, ds_j = vjp(jnp.asarray(cot))
        np.testing.assert_allclose(np.asarray(y_j), y_t, rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(dx_j), dx_t, rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(ds_j), ds_t, rtol=1e-4,
                                   atol=1e-6)
