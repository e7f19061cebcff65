"""Summarize a jax.profiler trace: device time by op family and source line.

Companion to `--profile-steps N` (ofq_tpu.cli.train) and
jax.profiler.trace: reads the Chrome-trace JSON that XProf writes and
prints where the device time went — the tool that found the round-2
bottlenecks (the 38.8 ms patch-embed conv backward, the fp32 LSQ chains).

Usage:  python benchmarks/trace_summary.py <trace_dir> [--steps N] [--top K]
        <trace_dir> is the directory passed to start_trace / --profile-steps
        (the *.trace.json.gz under plugins/profile/ is located automatically).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def load_events(trace_dir: str):
    pats = [os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"),
            os.path.join(trace_dir, "*.trace.json.gz")]
    files = sorted(sum((glob.glob(p) for p in pats), []))
    if not files:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    names = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev = [e for e in data["traceEvents"]
           if e.get("ph") == "X"
           and names.get(e.get("pid"), "").startswith("/device:")]
    return dev


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=1,
                    help="number of train steps captured (divides totals)")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    dev = load_events(args.trace_dir)
    skip = re.compile(r"^(jit_|\d+$)")  # containers: jit_<fn>, step regions
    fam = collections.defaultdict(lambda: [0.0, 0, 0])  # dur, flops, bytes
    src = collections.Counter()
    ops = collections.Counter()
    for e in dev:
        n = e["name"]
        if skip.match(n):
            continue
        a = e.get("args", {})
        g = re.sub(r"[.\d]+$", "", n)
        fam[g][0] += e.get("dur", 0)
        fam[g][1] += int(a.get("model_flops", 0) or 0)
        fam[g][2] += int(a.get("raw_bytes_accessed", 0) or 0)
        src[a.get("source", "?")] += e.get("dur", 0)
        ops[n] += e.get("dur", 0)

    ns = max(args.steps, 1)
    total = sum(v[0] for v in fam.values())
    print(f"device op time: {total / ns / 1e3:.1f} ms/step "
          f"({len(ops)} distinct ops)")
    print(f"\n{'family':34s} {'ms/step':>8s} {'TFLOP/s':>8s} {'GB/s':>7s}")
    for g, (d, f, b) in sorted(fam.items(), key=lambda kv: -kv[1][0])[:args.top]:
        ds = d / 1e6
        print(f"{g:34s} {d / ns / 1e3:8.2f} "
              f"{f / ds / 1e12 if ds else 0:8.1f} "
              f"{b / ds / 1e9 if ds else 0:7.0f}")
    print(f"\n{'source line':64s} {'ms/step':>8s}")
    for s, d in src.most_common(args.top):
        print(f"{str(s)[-64:]:64s} {d / ns / 1e3:8.2f}")


if __name__ == "__main__":
    main()
