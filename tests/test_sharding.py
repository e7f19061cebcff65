"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ofq_tpu.models import DeiTConfig, VisionTransformer
from ofq_tpu.parallel import batch_shardings, make_mesh, shard_params
from ofq_tpu.quant import default_deit_qmodules, policy_from_args
from ofq_tpu.train import TrainState, make_optimizer, make_train_step

TINY = DeiTConfig(img_size=32, patch_size=8, embed_dim=24, depth=2,
                  num_heads=3, num_classes=10)


def test_mesh_shapes(eight_devices):
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_dp_train_step(eight_devices):
    mesh = make_mesh(8, model_parallel=1)
    pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                           qmodules=default_deit_qmodules(2))
    model = VisionTransformer(cfg=TINY, policy=pol)
    x = jnp.zeros((8, 32, 32, 3))
    params = model.init({"params": jax.random.key(0)}, x)
    with jax.set_mesh(mesh):
        params = {"params": shard_params(params["params"], mesh)}
        tx = make_optimizer(lambda _: 1e-3)
        state = jax.jit(lambda p: TrainState.create(p, tx))(params)
        step = jax.jit(make_train_step(model, tx, loss_kind="ce"))
        bs = batch_shardings(mesh)
        batch = {
            "image": jax.device_put(
                jnp.asarray(np.random.default_rng(0).normal(
                    size=(8, 32, 32, 3)), jnp.float32), bs["image"]),
            "label": jax.device_put(jnp.arange(8) % 10, bs["label"]),
        }
        new_state, metrics = step(state, batch, jax.random.key(0))
        assert bool(jnp.isfinite(metrics["loss"]))
        assert int(new_state.step) == 1


def test_tp_dp_train_step(eight_devices):
    mesh = make_mesh(8, model_parallel=2)
    pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                           qmodules=default_deit_qmodules(2),
                           qk_reparam=True, qk_reparam_type=1)
    model = VisionTransformer(cfg=TINY, policy=pol)
    x = jnp.zeros((4, 32, 32, 3))
    params = model.init({"params": jax.random.key(0)}, x)
    with jax.set_mesh(mesh):
        sharded = shard_params(params["params"], mesh)
        # verify a TP kernel actually got partitioned over 'model'
        fc1 = sharded["blocks_0"]["mlp"]["fc1"]["kernel"]
        assert fc1.sharding.spec == P(None, "model")
        params = {"params": sharded}
        tx = make_optimizer(lambda _: 1e-3)
        state = jax.jit(lambda p: TrainState.create(p, tx))(params)
        step = jax.jit(make_train_step(
            model, tx, loss_kind="ce",
            cga=dict(bits=2, boundary_range=0.005, qk_reparam=True)))
        bs = batch_shardings(mesh)
        batch = {
            "image": jax.device_put(
                jnp.asarray(np.random.default_rng(0).normal(
                    size=(4, 32, 32, 3)), jnp.float32), bs["image"]),
            "label": jax.device_put(jnp.arange(4) % 10, bs["label"]),
        }
        new_state, metrics = step(state, batch, jax.random.key(0))
        assert bool(jnp.isfinite(metrics["loss"]))


def test_tp2_matches_single_device_base_geometry(eight_devices):
    """TP=2 x DP=4 must compute the same loss as a single device, at
    DeiT-B geometry (embed 768, 12 heads — the scale docs/SCALING.md §3
    claims TP pays at; depth/img reduced to keep the CPU test tractable,
    the per-layer shapes and Megatron column/row specs are DeiT-B's)."""
    cfg = DeiTConfig(img_size=64, patch_size=16, embed_dim=768, depth=2,
                     num_heads=12, num_classes=10)
    pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                           qmodules=default_deit_qmodules(2),
                           qk_reparam=True, qk_reparam_type=0)
    model = VisionTransformer(cfg=cfg, policy=pol)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(8, 64, 64, 3)),
                    jnp.float32)
    params = model.init({"params": jax.random.key(0)}, x)
    tx = make_optimizer(lambda _: 1e-3)
    batch = {"image": x, "label": jnp.arange(8) % 10}
    step = make_train_step(model, tx, loss_kind="ce")

    state0 = TrainState.create(params, tx)
    _, m_single = jax.jit(step)(state0, batch, jax.random.key(0))

    mesh = make_mesh(8, model_parallel=2)
    with jax.set_mesh(mesh):
        sharded = shard_params(params["params"], mesh)
        assert sharded["blocks_0"]["mlp"]["fc1"]["kernel"].sharding.spec \
            == P(None, "model")
        sp = {"params": sharded}
        state1 = jax.jit(lambda p: TrainState.create(p, tx))(sp)
        bs = batch_shardings(mesh)
        sbatch = {k: jax.device_put(v, bs[k]) for k, v in batch.items()}
        _, m_tp = jax.jit(step)(state1, sbatch, jax.random.key(0))
    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_tp["loss"]), rtol=1e-4)


def test_dp_matches_single_device(eight_devices):
    """The sharded step must compute the same numbers as unsharded."""
    pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                           qmodules=default_deit_qmodules(2))
    model = VisionTransformer(cfg=TINY, policy=pol)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(8, 32, 32, 3)),
                    jnp.float32)
    params = model.init({"params": jax.random.key(0)}, x)
    tx = make_optimizer(lambda _: 1e-3)
    batch = {"image": x, "label": jnp.arange(8) % 10}
    step = make_train_step(model, tx, loss_kind="ce")

    state0 = TrainState.create(params, tx)
    _, m_single = jax.jit(step)(state0, batch, jax.random.key(0))

    mesh = make_mesh(8, model_parallel=1)
    with jax.set_mesh(mesh):
        sp = {"params": shard_params(params["params"], mesh)}
        state1 = jax.jit(lambda p: TrainState.create(p, tx))(sp)
        bs = batch_shardings(mesh)
        sbatch = {k: jax.device_put(v, bs[k]) for k, v in batch.items()}
        _, m_dp = jax.jit(step)(state1, sbatch, jax.random.key(0))
    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_dp["loss"]), rtol=1e-4)


def test_int8_core_tp2_matches_single_device(eight_devices):
    """The bench-headline config (--matmul-impl int8, integer-core MXU
    dots) must shard exactly like the composed path: TP=2 x DP=4 loss ==
    single-device loss.  QKR so the int8_statsq_qkx (H,C,C) contraction
    is in the graph — its weight operand is TP-sharded by the Megatron
    specs and the (B,N,C) input DP-sharded."""
    cfg = dataclasses.replace(TINY, matmul_impl="int8")
    pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                           qmodules=default_deit_qmodules(2),
                           qk_reparam=True, qk_reparam_type=0)
    model = VisionTransformer(cfg=cfg, policy=pol)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(8, 32, 32, 3)),
                    jnp.float32)
    params = model.init({"params": jax.random.key(0)}, x)
    tx = make_optimizer(lambda _: 1e-3)
    batch = {"image": x, "label": jnp.arange(8) % 10}
    step = make_train_step(model, tx, loss_kind="ce")

    state0 = TrainState.create(params, tx)
    _, m_single = jax.jit(step)(state0, batch, jax.random.key(0))

    mesh = make_mesh(8, model_parallel=2)
    with jax.set_mesh(mesh):
        sp = {"params": shard_params(params["params"], mesh)}
        state1 = jax.jit(lambda p: TrainState.create(p, tx))(sp)
        bs = batch_shardings(mesh)
        sbatch = {k: jax.device_put(v, bs[k]) for k, v in batch.items()}
        _, m_tp = jax.jit(step)(state1, sbatch, jax.random.key(0))
    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_tp["loss"]), rtol=1e-4)
