"""Shared LSQ-scale-drift accounting for the bf16 risk study.

ONE definition of "walk every learned LSQ scale `s` under a quantizer
module path and compute the relative drift between two param trees" —
used by both benchmarks/bf16_study.py (fp32-vs-bf16 arms) and
benchmarks/bf16_seed_control.py (the seed-noise yardstick).  If the
quantizer param naming or the drift definition ever changes, both the
study and its control keep measuring the SAME param set, keeping the
comparison in docs/DESIGN.md §6b internally consistent.
"""

from __future__ import annotations

import numpy as np


def scales(tree, prefix=()):
    """Every LSQ scale param 's' under a quantizer module path
    (module names carry 'quant'/'quan': input_quant, quant_x, quan_qkx,
    quan_softmax, weight_quant, ...)."""
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from scales(v, prefix + (k,))
        elif k == "s" and any("quant" in p or "quan" in p for p in prefix):
            yield "/".join(prefix), np.asarray(v, np.float64)


def rel_drift(pa, pb) -> np.ndarray:
    """Flat array of |a-b|/max(|a|,1e-8) over every shared scale entry."""
    sa = dict(scales(pa))
    sb = dict(scales(pb))
    rel = [np.abs(sa[k] - sb[k]) / np.maximum(np.abs(sa[k]), 1e-8)
           for k in sa if k in sb and sa[k].shape == sb[k].shape]
    return np.concatenate([r.ravel() for r in rel])


def drift_stats(pa, pb) -> dict:
    rel = rel_drift(pa, pb)
    return {"median": float(np.median(rel)),
            "p95": float(np.percentile(rel, 95)), "n": int(rel.size)}
