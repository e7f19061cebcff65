"""Post-hoc analysis of the bf16-vs-fp32 study (benchmarks/bf16_study.py).

Adds the signals the saturating toy top-1 cannot carry: per-epoch
train-loss trajectory gaps and eval-accuracy curves per arm, then renders
the acceptance verdict for DESIGN.md's "bf16 risk" section.

Usage: python benchmarks/bf16_study_report.py [--out /tmp/bf16_study]
"""

from __future__ import annotations

import argparse
import csv
import itertools
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # lsq_drift


def read_summary(exp_dir):
    rows = []
    with open(os.path.join(exp_dir, "summary.csv")) as f:
        for row in csv.DictReader(f):
            rows.append({k: float(v) if v else float("nan")
                         for k, v in row.items()})
    return rows


def seed_control_drift(out, seeds):
    """Same-dtype cross-SEED LSQ-scale drift from the study's own final
    CGA checkpoints — the seed-noise yardstick the cross-dtype drift is
    judged against, measured under the exact study protocol (supersedes
    the separate benchmarks/bf16_seed_control.py runs).  `seeds` is the
    list of complete seed indices."""
    from lsq_drift import rel_drift

    from ofq_tpu.serve import Predictor

    ctl = {}
    for dtype, tag in (("float32", "floa"), ("bfloat16", "bflo")):
        params = {}
        for s in seeds:
            params[s] = Predictor.from_experiment(
                os.path.join(out, f"cga_s{s}_{tag}"),
                batch_size=8).params["params"]
        meds, p95s = [], []
        for i, j in itertools.combinations(seeds, 2):
            rel = rel_drift(params[i], params[j])
            meds.append(float(np.median(rel)))
            p95s.append(float(np.percentile(rel, 95)))
        ctl[dtype] = {"pairs": len(meds),
                      "median_range": [min(meds), max(meds)],
                      "p95_range": [min(p95s), max(p95s)]}
    return ctl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/bf16_study")
    ap.add_argument("--no-drift-control", action="store_true",
                    help="skip the cross-seed drift control (loads "
                         "2*seeds checkpoints)")
    a = ap.parse_args()
    with open(os.path.join(a.out, "bf16_study.json")) as f:
        study = json.load(f)
    # analyze every COMPLETE (fp32, bf16) seed pair — tolerant of a study
    # cut short by the round clock / a tunnel outage
    pairs = [s for s in range(study["config"]["seeds"])
             if f"seed{s}_float32" in study["runs"]
             and f"seed{s}_bfloat16" in study["runs"]]

    report = {"per_seed": {}, "n_seed_pairs": len(pairs)}
    if not pairs:
        # no complete pair: say so explicitly instead of emitting a
        # NaN-laden FAIL (json.dump would write non-standard NaN tokens)
        report["summary"] = {"acceptance": "NO-DATA",
                             "reason": "no complete (fp32, bf16) seed pair"}
        path = os.path.join(a.out, "bf16_study_report.json")
        with open(path, "w") as f:
            json.dump(report, f, indent=1)
        sys.exit(json.dumps(report["summary"]))
    deltas = {"fp": [], "qat": [], "cga": []}
    loss_gaps = []
    for s in pairs:
        per = {}
        for phase in ("fp", "qat", "cga"):
            t32 = study["runs"][f"seed{s}_float32"][f"top1_{phase}"]
            t16 = study["runs"][f"seed{s}_bfloat16"][f"top1_{phase}"]
            per[f"top1_{phase}_fp32"] = t32
            per[f"top1_{phase}_bf16"] = t16
            deltas[phase].append(t16 - t32)
        # train-loss trajectory gap on the QAT phase (the quantizer-heavy
        # one): max relative gap across epochs
        l32 = [r["train_loss"] for r in read_summary(
            os.path.join(a.out, f"qat_s{s}_floa"))]
        l16 = [r["train_loss"] for r in read_summary(
            os.path.join(a.out, f"qat_s{s}_bflo"))]
        n = min(len(l32), len(l16))
        rel = [abs(x - y) / max(abs(x), 1e-8)
               for x, y in zip(l32[:n], l16[:n])]
        per["qat_trainloss_max_relgap"] = max(rel)
        per["qat_trainloss_final_relgap"] = rel[-1]
        loss_gaps.append(max(rel))
        per.update(study.get("compare", {}).get(f"seed{s}", {}))
        report["per_seed"][f"seed{s}"] = per

    fp32_cga = [study["runs"][f"seed{s}_float32"]["top1_cga"]
                for s in pairs]
    sigma = float(np.std(fp32_cga, ddof=1)) if len(pairs) > 1 else 0.0
    mean_delta = float(np.mean(deltas["cga"]))
    report["summary"] = {
        "mean_final_top1_delta_bf16_minus_fp32": mean_delta,
        "per_phase_mean_delta": {k: float(np.mean(v))
                                 for k, v in deltas.items()},
        "fp32_seed_sigma": sigma,
        "max_qat_trainloss_relgap": max(loss_gaps),
        "acceptance": "PASS" if abs(mean_delta) <= max(0.2, sigma)
        else "FAIL",
        "criterion": "|mean delta| <= max(0.2 top-1, fp32 seed sigma)",
    }
    if not a.no_drift_control and len(pairs) > 1:
        report["seed_control_drift"] = seed_control_drift(a.out, pairs)
    path = os.path.join(a.out, "bf16_study_report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["summary"], indent=1))
    print("full report:", path)


if __name__ == "__main__":
    main()
