"""Chip/tunnel calibration: peak matmul rate, HBM bandwidth, dispatch floor.

Anchors for every MFU / bandwidth-bound claim in docs/DESIGN.md:
  * bf16 matmul TFLOP/s at a large square size (MXU roofline),
  * elementwise copy GB/s on a large array (HBM roofline),
  * per-step wall time of a trivial jitted op chained N times
    (the axon-tunnel dispatch floor — anything smaller than this per
    step is invisible to optimization).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

ITERS = 20


def _time(fn, *args, iters=ITERS):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    float(jax.tree.leaves(out)[0].ravel()[0])  # host fetch barrier
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o = args
        for _ in range(iters):
            o = (fn(*o),) if len(args) == 1 else fn(*o)
            if not isinstance(o, tuple):
                o = (o,)
        float(jax.tree.leaves(o)[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    n = 4096
    a = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def mm(x):
        return jnp.dot(x, x, preferred_element_type=jnp.bfloat16) * 0 + x

    # chained matmul: each iter is one (n,n)@(n,n)
    t_mm = _time(mm, a)
    tflops = 2 * n**3 / t_mm / 1e12

    big = jnp.ones((512, 1024, 1024), jnp.float32)  # 2 GiB

    @jax.jit
    def cp(x):
        return x * 1.0000001

    t_cp = _time(cp, big)
    gbps = 2 * big.size * 4 / t_cp / 1e9  # read + write

    tiny = jnp.ones((8, 8), jnp.float32)

    @jax.jit
    def nop(x):
        return x + 1.0

    t_nop = _time(nop, tiny, iters=100)

    print(json.dumps({
        "bf16_matmul_tflops": round(tflops, 1),
        "hbm_copy_gbps": round(gbps, 1),
        "dispatch_floor_ms": round(t_nop * 1e3, 3),
        "matmul_ms": round(t_mm * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
