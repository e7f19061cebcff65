"""The analytic model-FLOP count (ofq_tpu.utils.flops) must agree with
XLA's own post-optimization HloCostAnalysis on the real jitted train step.

This is the defense of the bench MFU headline: round 2 shipped two
conflicting counts (36.4 vs 52 GFLOP/img); the enumeration now has a
compiler oracle.  The analytic count is matmul-only, so it must come in
BELOW XLA's all-ops count, but within the elementwise margin (<15%: the
STE/LSQ chains, softmax, GELU and optimizer ride inside fusions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofq_tpu.utils.flops import deit_step_flops, swin_t_step_flops


def _xla_step_flops_per_img(student, teacher, batch_size):
    from ofq_tpu.train import TrainState, make_optimizer, make_train_step

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch_size, 224, 224, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 1000, size=(batch_size,)), jnp.int32)
    batch = {"image": x, "label": labels}
    sparams = jax.jit(lambda k, xx: student.init(
        {"params": k}, xx, train=False))(jax.random.key(0), x)
    tparams = jax.jit(lambda k, xx: teacher.init(
        {"params": k}, xx, train=False))(jax.random.key(1), x)["params"]
    tx = make_optimizer(lambda _: 1e-4, weight_decay=0.05)
    state = jax.jit(lambda p: TrainState.create(p, tx))(sparams)
    step = make_train_step(student, tx, teacher=teacher,
                          loss_kind="kd_soft_hard")
    compiled = jax.jit(step).lower(
        state, batch, jax.random.key(2), tparams).compile()
    ca = compiled.cost_analysis()
    return ca["flops"] / batch_size / 1e9


@pytest.mark.slow
def test_deit_s_qkr_step_flops_vs_cost_analysis():
    """The bench workload itself: DeiT-S W2A2 QKR + FP teacher."""
    from ofq_tpu.models import deit_model
    from ofq_tpu.quant import default_deit_qmodules, policy_from_args

    B = 2  # small batch keeps the CPU compile ~30s; the enumerator's
    #        batch-amortized terms (W_qk formation) track B exactly
    policy = policy_from_args(
        wq_bitw=2, aq_bitw=2, qmodules=default_deit_qmodules(12),
        qk_reparam=True, qk_reparam_type=0)
    student = deit_model("deit_small_distilled_patch16_224", policy=policy)
    teacher = deit_model("deit_small_distilled_patch16_224")
    xla = _xla_step_flops_per_img(student, teacher, B)
    analytic = deit_step_flops(batch=B).total
    ratio = analytic / xla
    assert 0.85 < ratio <= 1.005, (
        f"analytic {analytic:.2f} vs XLA {xla:.2f} GFLOP/img "
        f"(ratio {ratio:.3f})")
    # and the headline number bench.py prints (B=128 amortization)
    assert abs(deit_step_flops(batch=128).total - 50.85) < 0.1
