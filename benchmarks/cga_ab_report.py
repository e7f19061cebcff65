"""Summarize a (possibly partial) CGA A/B study into the committed
results artifact.

Reads <out>/cga_ab.json as written incrementally by cga_ab_study.py
(per-seed results land after each seed completes), computes the A/B
summary over WHATEVER seeds are present — a tunnel outage or round
boundary must not strand finished seeds — and writes
benchmarks/results/cga_ab_r5.json plus a human-readable table.

Usage: python benchmarks/cga_ab_report.py [--json /tmp/cga_ab/cga_ab.json]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def summarize(data: dict) -> dict:
    runs = data.get("runs", {})
    seeds = sorted(runs)
    brs = data.get("config", {}).get("boundary_ranges", [0.005])
    # a seed counts only if its control arm finished
    done = [s for s in seeds if "top1_nofreeze" in runs[s]]
    out = {
        "seeds_completed": done,
        "n_seeds": len(done),
        "boundary_ranges": brs,
        "frozen_fraction": data.get("frozen_fraction", {}),
        "per_seed": {s: runs[s] for s in done},
    }
    if not done:
        out["verdict"] = "no completed seeds"
        return out
    ctrl = [runs[s]["top1_nofreeze"] for s in done]
    out["control_top1_per_seed"] = ctrl
    out["control_seed_sigma"] = (
        float(np.std(ctrl, ddof=1)) if len(ctrl) > 1 else None)
    for br in brs:
        key = f"top1_cga_br{br}"
        have = [s for s in done if key in runs[s]]
        if not have:
            continue
        d = [runs[s][key] - runs[s]["top1_nofreeze"] for s in have]
        out[f"delta_br{br}"] = {
            "per_seed": {s: round(v, 3) for s, v in zip(have, d)},
            "mean": round(float(np.mean(d)), 3),
        }
        if out["control_seed_sigma"] is not None:
            out[f"delta_br{br}"]["exceeds_control_seed_sigma"] = bool(
                abs(np.mean(d)) > out["control_seed_sigma"])
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--json", default="/tmp/cga_ab/cga_ab.json")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results",
        "cga_ab_r5.json"))
    a = ap.parse_args()
    with open(a.json) as f:
        data = json.load(f)
    s = summarize(data)
    with open(a.out, "w") as f:
        json.dump(s, f, indent=1)
    print(json.dumps(s, indent=1))


if __name__ == "__main__":
    main()
