"""CGA efficacy A/B study (round-4 verdict directive #3).

Question: does confidence-guided annealing (the reference's flagship
algorithm, cga.py:450-469) *improve accuracy*, or is the observed
QAT->CGA lift (e.g. 57.2 -> 58.4 in the round-4 bf16 study) just "more
epochs"?  The CGA phase trains extra epochs at the pinned min_lr, so the
lift is confounded unless compared against an equal-budget finetune that
is identical in every respect except the freeze/restore transform.

Protocol (pre-registered, the DESIGN 6c instrument):
  * model: real deit_tiny_distilled_patch16_224 at 224x224, fp32
    (the bit-faithful path; dtype risk was settled by the r4 bf16 study)
  * data: medium-difficulty shapes ImageFolder (6 confusable rotated
    classes, 1800 train / 1800 val, 0.056% accuracy resolution)
  * N_SEEDS seeds; per seed ONE shared FP phase (12 ep) and ONE shared
    W2A2 QKR+KD QAT phase (12 ep), then the arms — all resumed from the
    SAME QAT checkpoint, all `freeze_for_n_epochs` epochs at the SAME
    pinned min_lr through the SAME cga CLI:
      - cga_br{BR}:  --boundaryRange BR --qk_reparam_type 1   (treatment)
      - nofreeze:    --cga_no_freeze   --qk_reparam_type 0    (control)
    The control differs ONLY in the freeze/restore transform (outer mask
    + in-forward type-1 detach); LR schedule, epochs, data order, loss,
    optimizer are identical.
  * default BR sweep {0.002, 0.005, 0.01} (reference recipes use 0.005;
    --no-br-sweep runs 0.005 only)
  * per arm: best top-1 over the window; plus the frozen-weight fraction
    at each BR computed from the QAT checkpoint (how much of the network
    CGA actually freezes — context for interpreting a null).

Acceptance (stated up front): report mean_seed(top1_cga - top1_nofreeze)
against the fp32 seed sigma of the control arm.  A positive effect
validates the port's headline algorithm; an honest null is acceptable
and must be documented (round-4 verdict #3).

Usage: python benchmarks/cga_ab_study.py [--out /tmp/cga_ab]
           [--seeds 3] [--epochs 12] [--cga-epochs 4] [--no-br-sweep]
Writes <out>/cga_ab.json and prints a summary table.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bf16_study import best_top1, run_phase  # one shared phase harness


def frozen_fraction(qat_dir, boundary_ranges, model_type="deit"):
    """Fraction of CGA-selected weights frozen at each BR, measured on
    the QAT checkpoint the arms resume from (outer mask only)."""
    import numpy as np

    from ofq_tpu.serve import Predictor
    from ofq_tpu.train import cga as cga_lib

    params = Predictor.from_experiment(qat_dir, batch_size=8).params["params"]
    out = {}
    for br in boundary_ranges:
        masks = cga_lib.freeze_masks(
            params, bits=2, boundary_range=br, qk_reparam=True,
            model_type=model_type)
        import jax

        tot = frz = 0
        for m in jax.tree.leaves(
                masks, is_leaf=lambda x: x is None):
            if m is None:
                continue
            m = np.asarray(m)
            tot += m.size
            frz += float(m.sum())
        out[str(br)] = frz / tot if tot else float("nan")
    return out


def chain(out_root, data, seed, epochs, cga_epochs, batch, steps,
          num_classes, boundary_ranges):
    tag = f"s{seed}_floa"  # shares fp/qat phase names with bf16_study
    common = [
        "ofq_tpu.cli.train", data, "--img-size", "224",
        "--num-classes", str(num_classes),
        "--batch-size", str(batch), "--steps-per-epoch", str(steps),
        "--mixup", "0.0", "--cutmix", "0.0", "--aa", "", "--reprob", "0.0",
        "--smoothing", "0.0", "--model", "deit_tiny_distilled_patch16_224",
        "--compute-dtype", "float32", "--cooldown-epochs", "0",
        "--seed", str(seed), "--output", out_root,
    ]
    quant = [
        "--quantized", "--wq-enable", "--wq-bitw", "2", "--wq-mode",
        "statsq", "--aq-enable", "--aq-bitw", "2", "--aq-mode", "lsq",
        "--aq_clip_learnable",
        "--use-kd", "--kd_hard_and_soft", "1",
        "--teacher", "deit_tiny_distilled_patch16_224",
        "--teacher_checkpoint", os.path.join(out_root, f"fp_{tag}"),
    ]
    res = {}
    log = lambda ph: os.path.join(out_root, f"{ph}_{tag}.log")
    res["t_fp"] = run_phase(
        common + ["--experiment", f"fp_{tag}", "--epochs", str(epochs),
                  "--lr", "2e-3"], log("fp"), epochs)
    res["top1_fp"] = best_top1(os.path.join(out_root, f"fp_{tag}"))
    res["t_qat"] = run_phase(
        common + quant + [
            "--experiment", f"qat_{tag}", "--epochs", str(epochs),
            "--lr", "1e-3", "--qk_reparam", "--qk_reparam_type", "0",
            "--pretrained_initialized", "--initial-checkpoint",
            os.path.join(out_root, f"fp_{tag}")], log("qat"), epochs)
    res["top1_qat"] = best_top1(os.path.join(out_root, f"qat_{tag}"))

    cga_common = list(common)
    cga_common[0] = "ofq_tpu.cli.cga"
    arm_common = cga_common + quant + [
        "--epochs", str(epochs), "--lr", "1e-3", "--qk_reparam",
        "--freeze_for_n_epochs", str(cga_epochs),
        "--resume", os.path.join(out_root, f"qat_{tag}")]
    for br in boundary_ranges:
        arm = f"cga_br{br}_{tag}"
        res[f"t_cga_br{br}"] = run_phase(
            arm_common + ["--experiment", arm, "--qk_reparam_type", "1",
                          "--boundaryRange", str(br)],
            log(f"cga_br{br}"), cga_epochs)
        res[f"top1_cga_br{br}"] = best_top1(os.path.join(out_root, arm))
    arm = f"nofreeze_{tag}"
    res["t_nofreeze"] = run_phase(
        arm_common + ["--experiment", arm, "--qk_reparam_type", "0",
                      "--cga_no_freeze"], log("nofreeze"), cga_epochs)
    res["top1_nofreeze"] = best_top1(os.path.join(out_root, arm))
    return res


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", default="/tmp/cga_ab")
    ap.add_argument("--data", default="/tmp/shapes_med")
    ap.add_argument("--n-per-class", type=int, default=300)
    ap.add_argument("--num-classes", type=int, default=6)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--cga-epochs", type=int, default=4)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=56)
    ap.add_argument("--no-br-sweep", action="store_true",
                    help="run BR=0.005 only (skip {0.002, 0.01})")
    a = ap.parse_args()
    os.makedirs(a.out, exist_ok=True)
    if not os.path.isdir(os.path.join(a.data, "train")):
        subprocess.run([sys.executable, "examples/make_shapes_dataset.py",
                        a.data, str(a.n_per_class), "--medium"],
                       check=True, cwd=REPO)
    train_dir = os.path.join(a.data, "train")
    classes = sorted(d for d in os.listdir(train_dir)
                     if os.path.isdir(os.path.join(train_dir, d)))
    if len(classes) != a.num_classes:
        sys.exit(f"--num-classes {a.num_classes} but {train_dir} holds "
                 f"{len(classes)} classes")
    brs = [0.005] if a.no_br_sweep else [0.002, 0.005, 0.01]
    results = {"config": {**vars(a), "boundary_ranges": brs},
               "runs": {}, "frozen_fraction": {}}
    out_json = os.path.join(a.out, "cga_ab.json")
    for seed in range(a.seeds):
        key = f"seed{seed}"
        print(f"=== {key}", flush=True)
        results["runs"][key] = chain(
            a.out, a.data, seed, a.epochs, a.cga_epochs, a.batch, a.steps,
            a.num_classes, brs)
        print(json.dumps(results["runs"][key]), flush=True)
        results["frozen_fraction"][key] = frozen_fraction(
            os.path.join(a.out, f"qat_s{seed}_floa"), brs)
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1)

    import numpy as np

    ctrl = [results["runs"][f"seed{s}"]["top1_nofreeze"]
            for s in range(a.seeds)]
    summary = {
        "control_top1_per_seed": ctrl,
        "control_seed_sigma": float(np.std(ctrl, ddof=1))
        if len(ctrl) > 1 else 0.0,
    }
    for br in brs:
        d = [results["runs"][f"seed{s}"][f"top1_cga_br{br}"] - ctrl[s]
             for s in range(a.seeds)]
        summary[f"delta_br{br}"] = {
            "per_seed": d, "mean": float(np.mean(d)),
            "exceeds_seed_sigma": bool(
                abs(np.mean(d)) > summary["control_seed_sigma"]),
        }
    results["summary"] = summary
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
