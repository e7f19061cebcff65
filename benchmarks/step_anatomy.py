"""Step-anatomy benchmark: where does the QAT training step spend its time?

Measures the DeiT-S W2A2 QKR training step (the bench.py workload — the
hot loop of reference train_scripts/deit_s/w2a2_deit_s.sh) in controlled
variants on the real chip, so every optimization claim in docs/DESIGN.md
is a measurement, not a guess.

Variants:
  full        — the default fp32 QAT step (bench.py configuration)
  bf16        — same step with compute_dtype='bfloat16' (token stream,
                quantizer math, and teacher in bf16)
  fp          — float student (no quantization), same teacher + KD loss
  noteacher   — QAT student, hard CE only (isolates the teacher forward)
  noqkr       — QAT step with plain QAttention (isolates the QKR einsums)
  fwd         — QAT forward only (no grad, loss value only)
  cga_bf16    — the CGA finetune step (freeze masks + restore in-graph)
  bf16m_bf16  — bf16 stream + bf16 master weights (BASELINE config 5)
  swin_bf16   — Swin-T W2A2 QKR step (BASELINE config 4)
  swin_<sub>  — any variant above on the Swin-T workload (e.g. swin_fp,
                swin_noqkr, swin_noteacher, swin_fwd) for the Swin
                step anatomy
  *int8*      — any variant containing "int8" (e.g. int8_bf16,
                swin_int8_bf16) runs with --matmul-impl int8 (the
                integer-core MXU path, docs/DESIGN.md §5d)
  *remat[s]*  — any Swin variant containing a "remat" token wraps stage
                blocks in jax.checkpoint (swin_bf16_remat = stages
                (0, 1); swin_bf16_remat0 = (0,)); composes with any
                sub-variant like "int8" does

Usage:  python benchmarks/step_anatomy.py [--variants full,bf16,...]
                                          [--batch 128] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 128
WARMUP = 3
ITERS = 10
ROUNDS = 3


def parse_variant(variant: str):
    """Decompose a variant name into (is_swin, sub, remat_stages).

    "swin_" selects the Swin-T workload; "int8" and "remat[stages]"
    compose with every sub-variant (int8_noteacher, swin_fwd_remat, ...)
    and are stripped so the equality-matched subs still hit; what's left
    is the anatomy sub-variant ("full" if nothing remains)."""
    is_swin = variant.startswith("swin")
    sub = variant[5:] if variant.startswith("swin_") else variant
    sub = "_".join(t for t in sub.split("_")
                   if t != "int8" and not t.startswith("remat")) or "full"
    # "swin_bf16_remat" -> stages (0, 1); "swin_bf16_remat0" -> (0,)
    remat_tok = next((t for t in variant.split("_")
                      if t.startswith("remat")), None)
    remat_stages = None
    if remat_tok is not None:
        tail = remat_tok[len("remat"):]
        remat_stages = tuple(int(c) for c in tail) if tail else (0, 1)
    return is_swin, sub, remat_stages


def build(variant: str, batch: int, dtype: str = None, attn_impl=None):
    from ofq_tpu.models import create_model
    from ofq_tpu.quant import (default_deit_qmodules, default_swin_qmodules,
                               policy_from_args)
    from ofq_tpu.train import TrainState, make_optimizer, make_train_step
    from ofq_tpu.train.schedule import cosine_with_warmup_cooldown

    # "swin_<sub>" runs the same anatomy sub-variant on the Swin-T W2A2
    # workload (BASELINE config 4); bare "swin_bf16" keeps its old meaning
    is_swin, sub, remat_stages = parse_variant(variant)
    quantized = sub != "fp"
    compute_dtype = dtype if dtype else ("bf16" in variant and "bfloat16" or None)
    model_name = "swin_t" if is_swin else "deit_small_distilled_patch16_224"
    if quantized:
        qmods = (default_swin_qmodules() if is_swin
                 else default_deit_qmodules(12))
        policy = policy_from_args(
            wq_bitw=2, aq_bitw=2, qmodules=qmods,
            qk_reparam=(sub != "noqkr"), qk_reparam_type=0)
    else:
        from ofq_tpu.quant import QuantPolicy
        policy = QuantPolicy()
    if is_swin:
        # recipe parity: the published Swin-T QAT recipe trains with
        # drop_path 0.0 (reference configs/swin_t_imagenet.attn_q.yml:43,
        # mirrored in configs/swin_imagenet_qat.yml)
        extra = {"drop_path_rate": 0.0, "attn_impl": attn_impl}
        if remat_stages is not None:
            extra["remat_stages"] = remat_stages
    else:
        if remat_stages is not None:
            # remat_stages is a SwinConfig knob; measuring a DeiT variant
            # without it but reporting under a remat label would commit a
            # mislabeled number (DeiT's remat lever is --attn-impl remat)
            raise ValueError(
                f"variant {variant!r}: 'remat' tokens are Swin-only "
                f"(SwinConfig.remat_stages); for DeiT use attn_impl='remat'")
        extra = {"attn_impl": attn_impl}  # DeiT-only knob
    if "int8" in variant:
        extra["matmul_impl"] = "int8"
    student = create_model(model_name, policy=policy,
                           compute_dtype=compute_dtype, **extra)
    teacher = create_model(model_name, compute_dtype=compute_dtype)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(batch, 224, 224, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 1000, size=(batch,)), jnp.int32)
    batch_d = {"image": x, "label": labels}

    sparams = jax.jit(
        lambda k, xx: student.init({"params": k}, xx, train=False)
    )(jax.random.key(0), x[:8])
    tparams = jax.jit(
        lambda k, xx: teacher.init({"params": k}, xx, train=False)
    )(jax.random.key(1), x[:8])["params"]
    if compute_dtype == "bfloat16":
        # frozen teacher: store its weights in bf16 outright
        tparams = jax.tree.map(lambda p: p.astype(jnp.bfloat16), tparams)

    lr_fn = cosine_with_warmup_cooldown(
        5.47e-4, epochs=300, warmup_epochs=5, warmup_lr=1e-6, min_lr=1e-5)
    tx = make_optimizer(lr_fn, weight_decay=0.05)
    state = jax.jit(lambda p: TrainState.create(p, tx))(sparams)

    loss_kind = "ce" if sub == "noteacher" else "kd_soft_hard"
    master_dtype = "bfloat16" if "bf16m" in variant else None
    cga = None
    if "cga" in variant:
        # the CGA finetune phase: in-graph freeze masks + post-step restore
        cga = dict(bits=2, boundary_range=0.005, qk_reparam=True,
                   model_type="swin" if is_swin else "deit")
    if master_dtype == "bfloat16":
        state = jax.jit(lambda s: s.replace(params={
            **s.params, "params": jax.tree.map(
                lambda p: p.astype(jnp.bfloat16), s.params["params"])}))(state)
    step_fn = make_train_step(
        student, tx, teacher=None if sub == "noteacher" else teacher,
        loss_kind=loss_kind, cga=cga, master_dtype=master_dtype)

    if sub == "fwd":
        def fwd_only(state, batch, rng, tparams):
            out, _ = student.apply(
                state.params, batch["image"], train=True,
                rngs={"dropout": rng, "droppath": rng})
            return state, {"loss": jnp.mean(out[0])}
        step = jax.jit(fwd_only)
    else:
        step = jax.jit(step_fn, donate_argnums=(0,))
    return step, state, batch_d, tparams


def time_variant(variant: str, batch: int, iters: int, dtype=None,
                 attn_impl=None) -> dict:
    step, state, batch_d, tparams = build(variant, batch, dtype, attn_impl)
    key = jax.random.key(2)
    n = 0
    t_c0 = time.perf_counter()
    for _ in range(WARMUP):
        state, metrics = step(state, batch_d, jax.random.fold_in(key, n),
                              tparams)
        n += 1
    float(metrics["loss"])  # host fetch == true barrier under the tunnel
    compile_s = time.perf_counter() - t_c0
    times = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, batch_d,
                                  jax.random.fold_in(key, n), tparams)
            n += 1
        float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    ms = min(times) / iters * 1e3
    return {"variant": variant + (f"+{dtype}" if dtype else "")
                       + (f"+{attn_impl}" if attn_impl else ""),
            "batch": batch, "step_ms": round(ms, 1),
            "imgs_per_sec": round(batch * 1e3 / ms, 1),
            "compile_s": round(compile_s, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="full,bf16,fp,noteacher,noqkr,fwd")
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--iters", type=int, default=ITERS)
    ap.add_argument("--dtype", default=None,
                    help="force compute_dtype for every variant")
    ap.add_argument("--attn-impl", dest="attn_impl", default=None)
    args = ap.parse_args()
    results = []
    for v in args.variants.split(","):
        r = time_variant(v.strip(), args.batch, args.iters, args.dtype,
                         args.attn_impl)
        print(json.dumps(r), flush=True)
        results.append(r)
    return results


if __name__ == "__main__":
    main()
