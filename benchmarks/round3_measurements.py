"""Round-3 measurement sweep on the real chip (run when the chip is idle).

Covers the directives' measured deliverables in one pass:
  * DeiT-S W2A2 QKR step: XLA-bf16 vs int8 integer core vs fp32
  * Swin-T W2A2 QKR step (after the natural-layout/4-D-chain rewrite)
  * DeiT-B W2A2 QKR single-chip row (reach check)
  * fused-attention-core eligibility at Swin's 49-token windows:
    Pallas core vs XLA composition on the exact window shapes
  * serving rates: frozen-fp vs --int-core on a packed artifact

Usage: python benchmarks/round3_measurements.py [--quick]
Writes benchmarks/round3_measurements.json (committed numbers quoted in
DESIGN.md / PARITY.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ofq_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

import bench


def swin_window_attention_micro(iters=20):
    """Pallas fused core vs XLA composition on Swin stage-1 window shapes
    (Bn=64*64 windows, n=49, H=3, d=32) — measure, don't assert."""
    from ofq_tpu.ops.fused_attention import quantized_attention_core
    from ofq_tpu.quant.lsq import lsq_quantize

    rng = np.random.default_rng(0)
    Bn, n, H, d = 64 * 64, 49, 3, 32
    C = H * d
    q = jnp.asarray(rng.normal(size=(Bn, n, H, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(Bn, n, H, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(Bn, n, H, d)), jnp.bfloat16)
    s = jnp.full((n,), 0.05, jnp.float32)

    def xla_tail(q, k, v, s):
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (d ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = lsq_quantize(attn, s, 2, all_positive=True, channel_axis=-2)
        return jnp.einsum("bhnm,bmhd->bnhd", attn, v)

    def pallas_tail(q, k, v, s):
        return quantized_attention_core(
            q, k, v, s, bits=2, sm_scale=d ** -0.5, quantize_softmax=True,
            interpret=jax.default_backend() == "cpu")

    out = {}
    for name, fn in (("xla", xla_tail), ("pallas", pallas_tail)):
        try:
            f = jax.jit(fn)
            r = f(q, k, v, s)
            float(jnp.sum(r.astype(jnp.float32)))
            t0 = time.perf_counter()
            for _ in range(iters):
                r = f(q, k, v, s)
            float(jnp.sum(r.astype(jnp.float32)))
            out[name + "_ms"] = round(
                (time.perf_counter() - t0) / iters * 1e3, 3)
        except Exception as e:  # pragma: no cover
            out[name + "_ms"] = f"ERROR: {type(e).__name__}: {e}"[:200]
    return out


def serving_rates(tmp="/tmp/r3_serving", batch=256, iters=10):
    """Frozen-fp vs int-core serving on a DeiT-S W2A2 artifact built from
    random init (rates don't depend on trained values)."""
    import dataclasses

    from ofq_tpu.deploy import export_packed, restore_packed
    from ofq_tpu.models import deit_model
    from ofq_tpu.quant import default_deit_qmodules, policy_from_args

    pol = policy_from_args(wq_bitw=2, aq_bitw=2,
                           qmodules=default_deit_qmodules(12),
                           qk_reparam=True, qk_reparam_type=0)
    model = deit_model("deit_small_distilled_patch16_224", policy=pol)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 224, 224, 3)), jnp.float32)
    params = jax.jit(lambda k, xx: model.init(
        {"params": k}, xx, train=False))(jax.random.key(0), x[:8])
    exported = export_packed(
        jax.tree.map(np.asarray, params["params"]),
        weight_bits=2, qk_reparam=True, num_heads=6)

    out = {}
    for mode, int_core in (("frozen_fp", False), ("int_core", True)):
        fpol = dataclasses.replace(
            pol, weight_frozen=True,
            frozen_int_bits=(2 if int_core else None))
        fmodel = deit_model("deit_small_distilled_patch16_224", policy=fpol,
                            compute_dtype="bfloat16")
        restored = restore_packed(exported, int_core=int_core)
        vars_ = {"params": jax.tree.map(jnp.asarray, restored)}
        f = jax.jit(lambda v, xx: fmodel.apply(v, xx, train=False)[0])
        r = f(vars_, x)
        float(jnp.sum(r.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(vars_, x)
        float(jnp.sum(r.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / iters
        out[mode + "_imgs_per_sec"] = round(batch / dt, 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    a = ap.parse_args()
    iters = 4 if a.quick else 8
    res = {}

    res["deit_s_bf16"] = round(bench._rate(
        compute_dtype="bfloat16", iters=iters, rounds=3), 1)
    res["deit_s_int8"] = round(bench._rate(
        matmul_impl="int8", compute_dtype="bfloat16", iters=iters,
        rounds=3), 1)
    res["deit_s_fp32"] = round(bench._rate(iters=max(iters // 2, 2),
                                             rounds=2), 1)
    # single-chip batch knee for the headline config (bench.BATCH=144 is
    # the measured winner; ~= the recipe's per-device batch 140)
    res["deit_s_int8_batch_sweep"] = {
        str(b): round(bench._rate(
            matmul_impl="int8", compute_dtype="bfloat16",
            iters=max(iters // 2, 2), rounds=2, batch=b), 1)
        for b in (128, 160, 192, 256)}
    res["swin_t_bf16_B64"] = round(bench._rate(
        compute_dtype="bfloat16", iters=iters, rounds=3, batch=64,
        model="swin_t"), 1)
    res["swin_t_bf16_B128"] = round(bench._rate(
        compute_dtype="bfloat16", iters=max(iters // 2, 2), rounds=2,
        batch=128, model="swin_t"), 1)
    res["swin_t_int8_B64"] = round(bench._rate(
        matmul_impl="int8", compute_dtype="bfloat16", iters=iters,
        rounds=2, batch=64, model="swin_t"), 1)
    # B48 is the measured Swin int8 knee (step_anatomy sweep 48/64/80/96:
    # 533/525/513/495 img/s; bench.py's swin secondary runs B48)
    res["swin_t_int8_B48"] = round(bench._rate(
        matmul_impl="int8", compute_dtype="bfloat16", iters=iters,
        rounds=2, batch=48, model="swin_t"), 1)
    res["deit_b_bf16_B64"] = round(bench._rate(
        compute_dtype="bfloat16", iters=max(iters // 2, 2), rounds=2,
        batch=64, model="deit_base_distilled_patch16_224"), 1)
    res["deit_b_int8_B64"] = round(bench._rate(
        matmul_impl="int8", compute_dtype="bfloat16",
        iters=max(iters // 2, 2), rounds=2,
        batch=64, model="deit_base_distilled_patch16_224"), 1)
    res["swin_window_attn_micro"] = swin_window_attention_micro()
    res["serving"] = serving_rates()

    from ofq_tpu.utils.flops import deit_step_flops, swin_t_step_flops

    res["bench_batch"] = bench.BATCH
    res["mfu"] = {
        "deit_s_bf16": round(
            res["deit_s_bf16"]
            * deit_step_flops(batch=bench.BATCH).total / 234e3, 4),
        "deit_s_int8": round(
            res["deit_s_int8"]
            * deit_step_flops(batch=bench.BATCH).total / 234e3, 4),
        "swin_t_bf16_B64": round(
            res["swin_t_bf16_B64"]
            * swin_t_step_flops(batch=64).total / 234e3, 4),
        "swin_t_int8_B64": round(
            res["swin_t_int8_B64"]
            * swin_t_step_flops(batch=64).total / 234e3, 4),
    }
    path = os.path.join(os.path.dirname(__file__),
                        "round3_measurements.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
