"""Serving benchmark: batch-1 latency and throughput of the deployed model.

The reference has no serving story (eval.py is its only inference path);
ofq_tpu ships one (`ofq_tpu.serve`, `ofq_tpu.deploy`) — this benchmark
measures it on the real chip so docs/DESIGN.md's serving claims are
numbers, not prose.

Paths measured on DeiT-S W2A2 QKR at 224 (the flagship recipe,
reference train_scripts/deit_s/w2a2_deit_s.sh):

  qat_eval   — the training model's eval forward (composed fake-quant
               chains; what `eval.py` runs during training)
  frozen_fp  — packed-artifact restore, fp frozen-weight forward
               (`serve --artifact`): kernels decoded to fp once at load
  int_core   — packed-artifact restore, integer-core forward
               (`serve --artifact --int-core`): the MXU consumes the
               artifact's int8 codes directly, exact int32 accumulation

For each path x batch size: per-image latency (ms) and steady-state
throughput (img/s), median over ROUNDS timed rounds (the axon tunnel
chip has real run-to-run variance; see docs/DESIGN.md §7).

Usage: python benchmarks/serving_latency.py [--batches 1,8,32,64,128,256]
           [--paths qat_eval,frozen_fp,int_core] [--dtype bfloat16]
           [--iters 20] [--json-out benchmarks/results/serving_latency.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

WARMUP = 3
ROUNDS = 5
FLAGSHIP = "deit_small_distilled_patch16_224"


def build_model_and_params(dtype: str | None, variant: str = FLAGSHIP):
    """W2A2 QKR QAT model for `variant` (flagship recipe's policy)."""
    from ofq_tpu.models import deit_model
    from ofq_tpu.quant import default_deit_qmodules, policy_from_args

    # derive depth from the registered config, not a hardcoded 12, so a
    # future variant with another depth gets the right qmodules list
    depth = deit_model(variant).cfg.depth
    pol = policy_from_args(
        wq_bitw=2, aq_bitw=2, qmodules=default_deit_qmodules(depth),
        qk_reparam=True, qk_reparam_type=0)
    model = deit_model(variant, policy=pol, compute_dtype=dtype)
    s = model.cfg.img_size
    x0 = jnp.zeros((2, s, s, 3), jnp.float32)
    params = jax.jit(
        lambda k, xx: model.init({"params": k}, xx, train=False)
    )(jax.random.key(0), x0)
    return pol, model, params


def make_predictors(dtype: str | None, paths: list[str],
                    variant: str = FLAGSHIP):
    """Build (name -> (model, params)) for each requested serving path.

    The frozen paths go through the REAL artifact machinery
    (export_packed -> restore_packed), so the measured decode semantics
    are exactly `serve --artifact`'s."""
    from ofq_tpu.deploy import export_packed, restore_packed
    from ofq_tpu.models import deit_model

    pol, model, params = build_model_and_params(dtype, variant)
    out = {}
    if "qat_eval" in paths:
        out["qat_eval"] = (model, params)
    need_frozen = {"frozen_fp", "int_core"} & set(paths)
    if need_frozen:
        exported = export_packed(
            jax.tree.map(np.asarray, params["params"]),
            weight_bits=2, qk_reparam=True, num_heads=model.cfg.num_heads)
    if "frozen_fp" in paths:
        fpol = dataclasses.replace(pol, weight_frozen=True)
        fmodel = deit_model(variant, policy=fpol, compute_dtype=dtype)
        fparams = {"params": jax.tree.map(jnp.asarray,
                                          restore_packed(exported))}
        out["frozen_fp"] = (fmodel, fparams)
    if "int_core" in paths:
        ipol = dataclasses.replace(pol, weight_frozen=True,
                                   frozen_int_bits=2)
        imodel = deit_model(variant, policy=ipol, compute_dtype=dtype)
        iparams = {"params": jax.tree.map(
            jnp.asarray, restore_packed(exported, int_core=True))}
        out["int_core"] = (imodel, iparams)
    return out


def time_path(model, params, batch: int, iters: int):
    """Median-of-ROUNDS steady-state rate + per-image latency.

    Also reports request-latency percentiles (p50/p99) from individually
    blocked calls — the number a serving SLO is written against, distinct
    from the pipelined steady-state rate above (which overlaps dispatch)."""
    fn = jax.jit(lambda p, x: jax.nn.softmax(
        model.apply(p, x, train=False)[0], axis=-1))
    s = model.cfg.img_size
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(batch, s, s, 3)), jnp.float32)
    for _ in range(WARMUP):
        fn(params, x).block_until_ready()
    rates = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(params, x)
        y.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        rates.append(batch / dt)
    med = statistics.median(rates)
    lat = []
    for _ in range(max(iters * ROUNDS, 50)):
        t0 = time.perf_counter()
        fn(params, x).block_until_ready()
        lat.append(1e3 * (time.perf_counter() - t0))
    lat.sort()
    return {"imgs_per_sec": round(med, 1),
            "latency_ms": round(1e3 * batch / med, 3),
            "latency_p50_ms": round(lat[len(lat) // 2], 3),
            "latency_p99_ms": round(lat[min(len(lat) - 1,
                                            int(len(lat) * 0.99))], 3),
            "rate_spread": [round(min(rates), 1), round(max(rates), 1)]}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batches", default="1,8,32,64,128,256")
    ap.add_argument("--paths", default="qat_eval,frozen_fp,int_core")
    ap.add_argument("--variant", default=FLAGSHIP)
    ap.add_argument("--dtype", default=None,
                    help="compute stream dtype (e.g. bfloat16); default "
                         "fp32 — the bit-faithful serving configuration")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--json-out", default=None)
    a = ap.parse_args(argv)

    batches = [int(b) for b in a.batches.split(",")]
    paths = a.paths.split(",")
    preds = make_predictors(a.dtype, paths, a.variant)
    results = {"device": str(jax.devices()[0]), "dtype": a.dtype or "float32",
               "variant": a.variant, "iters": a.iters, "rounds": ROUNDS,
               "paths": {}}
    for name, (model, params) in preds.items():
        results["paths"][name] = {}
        for b in batches:
            r = time_path(model, params, b, a.iters)
            results["paths"][name][str(b)] = r
            print(json.dumps({"path": name, "batch": b, **r}), flush=True)
    if a.json_out:
        d = os.path.dirname(a.json_out)
        if d:
            os.makedirs(d, exist_ok=True)
        with open(a.json_out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {a.json_out}")


if __name__ == "__main__":
    main()
