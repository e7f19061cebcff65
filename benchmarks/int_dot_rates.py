"""Micro-probe: MXU dot rates by operand dtype on this chip.

Motivation: the W2A2 fake-quant codes are tiny integers (odd weight
codes |w| <= 2^b-1, activation codes |x| <= 2^b-1), so the integer-core
dots (docs/DESIGN.md §5d) could in principle feed the MXU int4 operands
instead of int8 — IF the hardware/XLA run int4 faster.  This probe
measures pipelined dot throughput for bf16 / int8 / int4 operands at
the calibration shapes (benchmarks/chip_calibration.py methodology:
8 independent dots per jit call so per-dispatch overhead amortizes)
and at the bench workload's dominant shape (B*N x C x C).

Usage:  python benchmarks/int_dot_rates.py [--size 4096] [--iters 20]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def pipelined_dot_rate(dtype, m, k, n, iters=20, lanes=8,
                       accum=jnp.int32):
    """TFLOP/s (2*m*k*n per dot) of `lanes` independent dots per call."""
    rng = np.random.default_rng(0)
    if dtype == jnp.bfloat16:
        a = [jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
             for _ in range(lanes)]
        b = [jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)
             for _ in range(lanes)]
        accum = jnp.float32
    else:
        # values representative of W2A2 codes; materialize as int8 and
        # cast to the probe dtype INSIDE the jit (a bare host->int4
        # astype trips the axon tunnel's jit hook)
        a = [jnp.asarray(rng.integers(-3, 4, size=(m, k)), jnp.int8)
             for _ in range(lanes)]
        b = [jnp.asarray(rng.integers(-3, 4, size=(k, n)), jnp.int8)
             for _ in range(lanes)]

    @jax.jit
    def f(a, b):
        return [jax.lax.dot_general(
            x.astype(dtype), y.astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=accum) for x, y in zip(a, b)]

    r = f(a, b)
    float(jnp.sum(r[0].astype(jnp.float32)))  # true barrier (tunnel)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(a, b)
    float(jnp.sum(r[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    return 2.0 * m * k * n * lanes / dt / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=20)
    a = ap.parse_args()
    s = a.size

    shapes = [("square", s, s, s),
              ("bench_qlinear", 128 * 198, 384, 384)]
    for tag, m, k, n in shapes:
        out = {"shape": f"{m}x{k}x{n}"}
        # dtypes resolved by name INSIDE the guard: jnp.int4 may not
        # exist at all on some JAX builds, and the probe must still
        # record the bf16/int8 rates it exists to measure
        for name, attr in (("bf16", "bfloat16"), ("int8", "int8"),
                           ("int4", "int4")):
            try:
                dt = getattr(jnp, attr)
                out[name + "_tflops"] = round(
                    pipelined_dot_rate(dt, m, k, n, a.iters), 1)
            except Exception as e:  # pragma: no cover
                out[name + "_tflops"] = f"ERROR: {type(e).__name__}: {e}"[:120]
        print(tag, out)


if __name__ == "__main__":
    main()
