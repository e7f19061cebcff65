"""Micro-probe: can the QKR attention-scores dot run on the int8 MXU path?

The last bf16 dot left on the `--matmul-impl int8` training step is the
attention-logits einsum (nn/attention.py:540, reference attention.py:210):

    scores = einsum('bnc,bmhc->bhnm', xq, qkx)

Both operands are exact scaled integers plus a per-channel bias:
    xq  = xi * sx[n]    + bx[c]      (LSQ codes, per-token scale, post-bias)
    qkx = qi * sq[n, h] + ba[h, c]   (quan_qkx codes + move_qkx_aft bias)
and every scale is CONSTANT along the contracted axis c, so the product
factorizes exactly into one int8 x int8 -> int32 batched dot plus three
cheap rank-reduced corrections:

    scores = sx[n] sq[m,h] * einsum('bnc,bmhc->bhnm', xi, qi)      (int32)
           + sx[n] * einsum('bnc,hc->bnh', xi, ba)[..., None, :]   broadcast m
           + sq[m,h] * einsum('c,bmhc->bmh', bx, qi)[:, None]      broadcast n
           + (bx @ ba^T)[h]                                        const

This probe measures, at the bench workload's attention shape
(B=144, N=M=197, H=6, C=384, the DeiT-S W2A2 headline), forward wall
time of (a) the composed bf16 reconstruct-and-dot and (b) the int8
factorization — the decision input for wiring an `int8_scores` op into
ops/int8_qlinear.py.  The open hardware question is whether Mosaic/XLA
lower a BATCHED int8 dot_general (batch dim b, contraction c) at a sane
rate; the non-batched probe (int_dot_rates.py) measured int8 ~parity at
K=384, so the expected win is operand bytes (qkx bf16 is 131 MB/block),
not MXU rate.

RESULT (2026-08-19, v5e via axon, softmax consumer): composed bf16
2.80-2.97 ms vs int8-factorized 3.24 ms (fp32 corrections) / 2.98 ms
(bf16 corrections) — the factorization loses 6-9%.  The op is bound by
the 134 MB (B,H,N,M) logits tensor both paths materialize for softmax;
the bf16 operand reconstruct fuses into the dot's reads, so int8 saves
bytes the fusion never pays for while adding the correction einsums.
Recorded as a measured exclusion in docs/DESIGN.md §"Where the int8
win actually comes from"; the scores dot stays bf16.

Usage: python benchmarks/scores_dot_lab.py [--batch 144] [--iters 20]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _inputs(b, n, h, c, seed=0):
    rng = np.random.default_rng(seed)
    xi = rng.integers(-2, 2, size=(b, n, c)).astype(np.int8)       # 2-bit codes
    qi = rng.integers(-2, 2, size=(b, n, h, c)).astype(np.int8)
    sx = (rng.uniform(0.01, 0.1, size=(n, 1))).astype(np.float32)
    sq = (rng.uniform(0.01, 0.1, size=(n, h))).astype(np.float32)
    bx = rng.normal(size=(c,)).astype(np.float32) * 0.01
    ba = rng.normal(size=(h, c)).astype(np.float32) * 0.01
    return (jnp.asarray(xi), jnp.asarray(qi), jnp.asarray(sx),
            jnp.asarray(sq), jnp.asarray(bx), jnp.asarray(ba))


def composed(xi, qi, sx, sq, bx, ba, dtype=jnp.bfloat16):
    """Reconstruct the fp operands (as the current chain does) and run
    the bf16 dot — the shipped formulation."""
    xq = (xi.astype(dtype) * sx.astype(dtype) + bx.astype(dtype))
    qkx = (qi.astype(dtype) * sq[None, :, :, None].astype(dtype)
           + ba.astype(dtype))
    return jnp.einsum("bnc,bmhc->bhnm", xq, qkx,
                      preferred_element_type=jnp.float32)


def factorized(xi, qi, sx, sq, bx, ba):
    """The exact int8 factorization (fwd only), emitted straight into the
    (B, H, N, M) layout the softmax consumer reads (no transpose)."""
    acc = jnp.einsum("bnc,bmhc->bhnm", xi, qi,
                     preferred_element_type=jnp.int32)
    t1 = (acc.astype(jnp.float32)
          * sx.reshape(1, 1, -1, 1)                  # sx[n]
          * jnp.transpose(sq)[None, :, None, :])     # sq[m,h] -> (H, M)
    t2 = (jnp.einsum("bnc,hc->bnh", xi.astype(jnp.bfloat16),
                     ba.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
          * sx[None, :, :1])                         # (B, N, H)
    t3 = (jnp.einsum("c,bmhc->bmh", bx.astype(jnp.bfloat16),
                     qi.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
          * sq[None, :, :])                          # (B, M, H)
    t4 = ba.astype(jnp.float32) @ bx.astype(jnp.float32)  # (H,)
    return (t1
            + jnp.transpose(t2, (0, 2, 1))[:, :, :, None]   # (B,H,N,1)
            + jnp.transpose(t3, (0, 2, 1))[:, :, None, :]   # (B,H,1,M)
            + t4[None, :, None, None])


def bench(fn, args, iters, consumer="softmax"):
    """Time fn at steady state.  consumer='softmax' appends the real
    downstream op (softmax over m then mean) so XLA must produce the
    (B,H,N,M) tensor in a softmax-friendly layout — a sum-only consumer
    lets it elide layout work the real step cannot."""
    if consumer == "softmax":
        def wrapped(*a):
            return jnp.mean(jax.nn.softmax(
                fn(*a) * 0.125, axis=-1).astype(jnp.float32))
    else:
        def wrapped(*a):
            return jnp.sum(fn(*a).astype(jnp.float32))
    f = jax.jit(wrapped)
    r = float(f(*args))  # compile + barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(out)
    return (time.perf_counter() - t0) / iters * 1e3, r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=144)
    ap.add_argument("--iters", type=int, default=20)
    a = ap.parse_args()
    B, N, H, C = a.batch, 197, 6, 384
    args = _inputs(B, N, H, C)

    ms_c, ref = bench(composed, args, a.iters)
    ms_f, val = bench(factorized, args, a.iters)
    # exactness check in fp32 (the bf16 composed path rounds; compare the
    # factorization against an fp32 composed reference instead)
    ref32 = float(jax.jit(lambda *s: jnp.mean(jax.nn.softmax(
        composed(*s, dtype=jnp.float32) * 0.125, axis=-1)))(*args))
    rel = abs(val - ref32) / max(1e-12, abs(ref32))
    gb = (B * N * C * (H + 1)) * 2 / 1e9  # bf16 operand bytes, composed
    print({"shape": f"B{B} N{N} H{H} C{C}",
           "composed_bf16_ms": round(ms_c, 3),
           "int8_factorized_ms": round(ms_f, 3),
           "speedup": round(ms_c / ms_f, 3),
           "factorized_vs_fp32_rel": f"{rel:.2e}",
           "composed_operand_gb": round(gb, 3)})


if __name__ == "__main__":
    main()
