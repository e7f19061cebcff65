"""Capture a jax.profiler device trace of one step_anatomy variant.

Usage:  python benchmarks/trace_variant.py <variant> [--batch N] [--out DIR]
then:   python benchmarks/trace_summary.py <DIR>
"""

from __future__ import annotations

import argparse
import time

import jax

from step_anatomy import build


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variant")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--out", default=None)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()
    out = args.out or f"/tmp/trace_{args.variant}_B{args.batch}"

    step, state, batch_d, tparams = build(args.variant, args.batch)
    key = jax.random.key(2)
    n = 0
    for _ in range(4):  # warmup/compile
        state, metrics = step(state, batch_d, jax.random.fold_in(key, n),
                              tparams)
        n += 1
    float(metrics["loss"])
    jax.profiler.start_trace(out)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch_d, jax.random.fold_in(key, n),
                              tparams)
        n += 1
    float(metrics["loss"])
    wall = (time.perf_counter() - t0) / args.steps
    jax.profiler.stop_trace()
    print({"variant": args.variant, "batch": args.batch,
           "step_ms": round(wall * 1e3, 1), "trace": out})


if __name__ == "__main__":
    main()
