"""Seed-noise control for the bf16 study's LSQ-scale drift metric.

The bf16-vs-fp32 comparison in benchmarks/bf16_study.py reports relative
drift of every LSQ scale between the two arms of the same seed.  Raw
drift numbers are uninterpretable without a yardstick: two training runs
that differ in ANY numerics diverge chaotically, so the question is
whether the dtype-induced drift exceeds the drift between two runs that
differ ONLY by seed.  This script computes that yardstick from the
study's finished CGA checkpoints:

  * fp32 seed-A vs fp32 seed-B   (pure seed noise, same numerics)
  * bf16 seed-A vs bf16 seed-B   (seed noise under the speed path)
  * fp32 vs bf16 at equal seed   (the dtype effect, re-derived)

If the third is <= the first two, the speed path's effect on quantizer
scales is indistinguishable from trajectory chaos — no systematic
attractor shift.  Round-3 result (3 seeds, DeiT-T W2A2 QKR, full
three-phase chain): dtype drift median 0.012 / p95 0.56 vs seed noise
median 0.040 / p95 0.72-0.83 — see docs/DESIGN.md "bf16 risk".

Usage: python benchmarks/bf16_seed_control.py [--out /tmp/bf16_study]
                                              [--phase cga] [--seeds 0 1]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from lsq_drift import drift_stats as drift  # noqa: E402  (shared with bf16_study)


def load_params(exp):
    """Raw-orbax restore of the newest step (no model build needed)."""
    import orbax.checkpoint as ocp

    step = max(int(os.path.basename(p)) for p in glob.glob(exp + "/[0-9]*"))
    path = os.path.join(exp, str(step))
    if "default" in os.listdir(path):
        path = os.path.join(path, "default")
    return ocp.PyTreeCheckpointer().restore(path)


def find_params(tree):
    """Locate the model param subtree inside the restored train state."""
    if isinstance(tree, dict):
        if "params" in tree and isinstance(tree["params"], dict):
            inner = tree["params"]
            return inner.get("params", inner)
        for v in tree.values():
            if isinstance(v, dict):
                r = find_params(v)
                if r is not None:
                    return r
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/bf16_study")
    ap.add_argument("--phase", default="cga")
    ap.add_argument("--seeds", type=int, nargs=2, default=(0, 1))
    a = ap.parse_args()
    sa, sb = a.seeds

    def params(seed, dtag):
        exp = os.path.join(a.out, f"{a.phase}_s{seed}_{dtag}")
        p = find_params(load_params(exp))
        assert p is not None, f"no params under {exp}"
        return p

    out = {
        f"{a.phase}_fp32_seed{sa}_vs_seed{sb}":
            drift(params(sa, "floa"), params(sb, "floa")),
        f"{a.phase}_bf16_seed{sa}_vs_seed{sb}":
            drift(params(sa, "bflo"), params(sb, "bflo")),
        f"{a.phase}_seed{sa}_fp32_vs_bf16":
            drift(params(sa, "floa"), params(sa, "bflo")),
    }
    with open(os.path.join(a.out, "seed_control.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
