"""Post-hoc analysis of the bf16-vs-fp32 study (benchmarks/bf16_study.py).

Adds the signals the saturating toy top-1 cannot carry: per-epoch
train-loss trajectory gaps and eval-accuracy curves per arm, then renders
the acceptance verdict for DESIGN.md's "bf16 risk" section.

Usage: python benchmarks/bf16_study_report.py [--out /tmp/bf16_study]
"""

from __future__ import annotations

import argparse
import csv
import json
import os

import numpy as np


def read_summary(exp_dir):
    rows = []
    with open(os.path.join(exp_dir, "summary.csv")) as f:
        for row in csv.DictReader(f):
            rows.append({k: float(v) if v else float("nan")
                         for k, v in row.items()})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/bf16_study")
    a = ap.parse_args()
    with open(os.path.join(a.out, "bf16_study.json")) as f:
        study = json.load(f)
    seeds = study["config"]["seeds"]

    report = {"per_seed": {}}
    deltas = {"fp": [], "qat": [], "cga": []}
    loss_gaps = []
    for s in range(seeds):
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
                for s in range(seeds)]
    sigma = float(np.std(fp32_cga, ddof=1)) if seeds > 1 else 0.0
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
    path = os.path.join(a.out, "bf16_study_report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["summary"], indent=1))
    print("full report:", path)


if __name__ == "__main__":
    main()
