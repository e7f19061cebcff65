"""Oscillation tracking: unit semantics + in-step telemetry."""

import jax
import jax.numpy as jnp
import numpy as np

from ofq_tpu.models import DeiTConfig, VisionTransformer
from ofq_tpu.quant import (
    default_deit_qmodules,
    init_oscillation_state,
    policy_from_args,
    track_oscillation,
)
from ofq_tpu.train import TrainState, make_optimizer, make_train_step
from ofq_tpu.train.oscillation_hook import (
    init_oscillation_states,
    weight_int_image,
)

TINY = DeiTConfig(img_size=32, patch_size=8, embed_dim=24, depth=2,
                  num_heads=3, num_classes=10)


class TestTrackOscillation:
    def test_flip_flop_detection(self):
        x0 = jnp.zeros((4,))
        st = init_oscillation_state(x0)
        # 0 -> 1: switch but no oscillation yet
        x1, st = track_oscillation(jnp.ones((4,)), st, momentum=0.5)
        assert float(st.ema_oscillation.max()) == 0.0
        # 1 -> 0: direction reversed -> oscillation
        x2, st = track_oscillation(jnp.zeros((4,)), st, momentum=0.5)
        assert float(st.ema_oscillation.max()) == 0.5
        # 0 -> 0: no switch, ema decays
        x3, st = track_oscillation(jnp.zeros((4,)), st, momentum=0.5)
        assert float(st.ema_oscillation.max()) == 0.25

    def test_freeze_pins_value(self):
        st = init_oscillation_state(jnp.zeros((1,)))
        xs = [1.0, 0.0, 1.0, 0.0, 1.0]
        for v in xs:
            out, st = track_oscillation(
                jnp.asarray([v]), st, momentum=0.5, freeze_threshold=0.6)
        assert bool(st.frozen[0])
        # once frozen, output is pinned regardless of input
        out, st = track_oscillation(
            jnp.asarray([123.0]), st, momentum=0.5, freeze_threshold=0.6)
        assert float(out[0]) != 123.0

    def test_weight_int_image_levels(self):
        w = jnp.asarray(np.random.default_rng(0).normal(size=(16, 8)),
                        jnp.float32)
        xi = weight_int_image(w, 2)
        vals = np.unique(np.asarray(xi))
        assert set(vals) <= {-2.0, -1.0, 0.0, 1.0}

    def test_weight_int_image_exact_under_bf16_masters(self):
        """The integer image must be computed in fp32: at 8 bits a bf16
        image (ulp 1.0 near n=128) lands whole levels off, corrupting
        oscillation EMAs and freeze decisions under --master-dtype
        bfloat16."""
        w16 = jnp.asarray(np.random.default_rng(1).normal(size=(64, 48)),
                          jnp.bfloat16)
        xi16 = np.asarray(weight_int_image(w16, 8))
        xi32 = np.asarray(weight_int_image(w16.astype(jnp.float32), 8))
        assert xi16.dtype == np.float32
        np.testing.assert_array_equal(xi16, xi32)


class TestInStepTelemetry:
    def test_train_step_updates_oscillation(self):
        pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                               qmodules=default_deit_qmodules(2))
        model = VisionTransformer(cfg=TINY, policy=pol)
        x = jnp.zeros((2, 32, 32, 3))
        params = model.init({"params": jax.random.key(0)}, x)
        tx = make_optimizer(lambda _: 5e-2)
        osc = init_oscillation_states(params["params"], bits=2)
        assert len(osc) == 8  # fc1/fc2/qkv/proj x 2 blocks
        state = TrainState.create(params, tx, extra={"oscillation": osc})
        step = jax.jit(make_train_step(
            model, tx, loss_kind="ce", oscillation=dict(bits=2)))
        batch = {
            "image": jnp.asarray(
                np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                jnp.float32),
            "label": jnp.asarray([1, 2]),
        }
        s1, m1 = step(state, batch, jax.random.key(0))
        s2, m2 = step(s1, batch, jax.random.key(1))
        assert "oscillation/ema_mean" in m2
        one = next(iter(s2.extra["oscillation"].values()))
        assert int(one.iters) == 2


class TestFreezePinning:
    def test_frozen_weights_stop_moving(self):
        """With a freeze threshold, weights whose integer image oscillates
        get pinned (apply_frozen) while the rest keep training."""
        from ofq_tpu.train.oscillation_hook import (
            apply_frozen,
            init_oscillation_states,
            update_oscillation_states,
        )
        from ofq_tpu.quant.oscillation import OscillationState

        pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                               qmodules=default_deit_qmodules(2))
        model = VisionTransformer(cfg=TINY, policy=pol)
        x = jnp.zeros((2, 32, 32, 3))
        params = model.init({"params": jax.random.key(0)}, x)["params"]
        states = init_oscillation_states(params, bits=2)
        # force one kernel fully frozen at its tracked integer image
        name = "blocks_0/mlp/fc1/kernel"
        st = states[name]
        states[name] = st._replace(
            frozen=jnp.ones_like(st.frozen, bool),
            frozen_x_int=st.prev_x_int)
        moved = jax.tree.map(lambda v: v + 1.0, params)
        pinned = apply_frozen(params, moved, states, bits=2)
        # the pinned kernel's StatsQ integer image equals the frozen ints
        from ofq_tpu.train.oscillation_hook import weight_int_image

        np.testing.assert_allclose(
            np.asarray(weight_int_image(
                pinned["blocks_0"]["mlp"]["fc1"]["kernel"], 2)),
            np.asarray(states[name].frozen_x_int))
        # untracked / unfrozen leaves still move
        np.testing.assert_allclose(
            np.asarray(pinned["blocks_0"]["mlp"]["fc2"]["kernel"]),
            np.asarray(moved["blocks_0"]["mlp"]["fc2"]["kernel"]))

    def test_train_step_pins_with_threshold(self):
        from ofq_tpu.train.oscillation_hook import init_oscillation_states

        pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                               qmodules=default_deit_qmodules(2))
        model = VisionTransformer(cfg=TINY, policy=pol)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)),
                        jnp.float32)
        params = model.init({"params": jax.random.key(0)}, x)
        tx = make_optimizer(lambda _: 5e-2)
        osc = init_oscillation_states(params["params"], bits=2)
        state = TrainState.create(params, tx, extra={"oscillation": osc})
        step = jax.jit(make_train_step(
            model, tx, loss_kind="ce",
            oscillation=dict(bits=2, momentum=0.5, freeze_threshold=0.4)))
        batch = {"image": x, "label": jnp.asarray([1, 2])}
        for i in range(6):
            state, m = step(state, batch, jax.random.key(i))
        # telemetry present and step ran with pinning enabled
        assert "oscillation/ema_mean" in m
        assert bool(jnp.isfinite(m["loss"]))
