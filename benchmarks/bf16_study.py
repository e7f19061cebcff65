"""bf16-speed-path accuracy risk study (round-3 directive #3).

Question: does training with `--compute-dtype bfloat16` (the bench
headline's speed path — bf16 token stream + quantizer math, fp32 masters)
change the final accuracy of the full three-phase recipe relative to the
bit-faithful fp32 path?

Protocol — the largest controlled differential this box allows:
  * model: real deit_tiny_distilled_patch16_224 at 224x224 (full DeiT-T
    geometry, N=198; only the dataset is a stand-in — ImageNet does not
    exist on this machine, see VERDICT r2 missing #1)
  * data: the medium-difficulty shapes ImageFolder (6 confusable rotated
    classes, noise/occlusion/JPEG jitter; real JPEGs through the real
    tf.data train pipeline; 1800 train / 1800 val).  Round-3's 150-image
    easy val set resolved accuracy in 0.67% steps and every fp32 arm
    saturated at 100% (verdict r3 weak #2); 1800 val images resolve
    0.056% steps and the medium task leaves fp32 below ceiling.
  * N_SEEDS seeds x {float32, bfloat16}, each running the FULL chain
    FP -> W2A2 QKR QAT (KD from the arm's own FP ckpt) -> CGA
    (examples/three_phase_shapes.sh structure, reference recipe phases)
  * per (seed, dtype): final/best top-1 of every phase; per seed:
    cross-arm LSQ-scale relative drift and eval-logit divergence of the
    final CGA checkpoints on one fixed deterministic batch.

Acceptance criterion (stated up front): the recipe budget is +-0.2 top-1
on ImageNet W2A2 (BASELINE.md).  At this scale we require
|mean_seed(top1_bf16 - top1_fp32)| <= max(0.2, 1 seed-sigma of the fp32
arm) — i.e. the dtype effect must be indistinguishable from seed noise.
What would falsify the speed path: a consistent signed gap across seeds
larger than seed noise, or LSQ scales drifting to different attractors
(rel drift >> the ~1e-3 bf16 rounding floor).

Usage:  python benchmarks/bf16_study.py [--out /tmp/bf16_study]
                                        [--seeds 3] [--epochs 12]
Writes <out>/bf16_study.json and prints a summary table.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)  # in-process compare_arms imports ofq_tpu
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # lsq_drift


def run_phase(args_list, log_path, expect_rows):
    # resume support: a COMPLETED phase is skipped so a crashed study
    # restart reuses finished work.  summary.csv is appended every epoch,
    # so mere existence means "started", not "done" — require the full
    # epoch-row count, else rerun (auto-resume picks up the partial run)
    for i, tok in enumerate(args_list):
        if tok == "--experiment":
            exp = os.path.join(args_list[args_list.index("--output") + 1],
                               args_list[i + 1])
            path = os.path.join(exp, "summary.csv")
            if os.path.exists(path):
                with open(path) as f:
                    rows = sum(1 for _ in csv.DictReader(f))
                if rows >= expect_rows:
                    return 0.0
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ofq_tpu_jax_cache")
    t0 = time.time()
    with open(log_path, "w") as f:
        p = subprocess.run([sys.executable, "-m"] + args_list, env=env,
                           stdout=f, stderr=subprocess.STDOUT, cwd=REPO)
    if p.returncode != 0:
        tail = open(log_path).read()[-3000:]
        raise RuntimeError(f"phase failed ({args_list[:3]}...):\n{tail}")
    return time.time() - t0


def best_top1(exp_dir):
    path = os.path.join(exp_dir, "summary.csv")
    best = -1.0
    with open(path) as f:
        for row in csv.DictReader(f):
            best = max(best, float(row["top1"]))
    return best


def chain(out_root, data, seed, dtype, epochs, cga_epochs, batch, steps,
          num_classes=3):
    tag = f"s{seed}_{dtype[:4]}"
    common = [
        "ofq_tpu.cli.train", data, "--img-size", "224",
        "--num-classes", str(num_classes),
        "--batch-size", str(batch), "--steps-per-epoch", str(steps),
        "--mixup", "0.0", "--cutmix", "0.0", "--aa", "", "--reprob", "0.0",
        "--smoothing", "0.0", "--model", "deit_tiny_distilled_patch16_224",
        "--compute-dtype", dtype, "--cooldown-epochs", "0",
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
    cga = list(common)
    cga[0] = "ofq_tpu.cli.cga"
    res["t_cga"] = run_phase(
        cga + quant + [
            "--experiment", f"cga_{tag}", "--epochs", str(epochs),
            "--lr", "1e-3", "--qk_reparam", "--qk_reparam_type", "1",
            "--boundaryRange", "0.005",
            "--freeze_for_n_epochs", str(cga_epochs),
            "--resume", os.path.join(out_root, f"qat_{tag}")], log("cga"),
        cga_epochs)
    res["top1_cga"] = best_top1(os.path.join(out_root, f"cga_{tag}"))
    return res


def compare_arms(out_root, data, seed, num_classes=3):
    """Cross-arm comparison of the final CGA checkpoints: LSQ scale drift
    + logit divergence on one fixed deterministic batch."""
    import numpy as np

    import jax

    from ofq_tpu.data import DataConfig, make_dataset
    from ofq_tpu.serve import Predictor

    preds = {}
    for dtype in ("float32", "bfloat16"):
        tag = f"s{seed}_{dtype[:4]}"
        preds[dtype] = Predictor.from_experiment(
            os.path.join(out_root, f"cga_{tag}"), batch_size=32)
    batch = next(iter(make_dataset(
        DataConfig(data_dir=data, img_size=224, batch_size=32,
                   num_classes=num_classes, seed=0), train=False)))
    x = batch["image"][:32]

    out = {}
    logits = {}
    for dtype, p in preds.items():
        # eval through the predictor's own model (the arm's compute dtype)
        logits[dtype] = np.asarray(p.predict(x))
    la, lb = logits["float32"], logits["bfloat16"]
    out["argmax_agree_frac"] = float((la.argmax(-1) == lb.argmax(-1)).mean())
    out["max_abs_prob_diff"] = float(np.abs(la - lb).max())

    # LSQ scale drift — the ONE shared walk/drift definition also used by
    # the seed-noise control (benchmarks/lsq_drift.py)
    from lsq_drift import rel_drift

    rel = rel_drift(preds["float32"].params["params"],
                    preds["bfloat16"].params["params"])
    out["lsq_scale_rel_drift_median"] = float(np.median(rel))
    out["lsq_scale_rel_drift_p95"] = float(np.percentile(rel, 95))
    out["n_scale_params"] = int(rel.size)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/bf16_study")
    ap.add_argument("--data", default="/tmp/shapes_med")
    ap.add_argument("--level", default="medium",
                    choices=("easy", "medium", "hard"),
                    help="difficulty when auto-generating --data")
    ap.add_argument("--n-per-class", type=int, default=300)
    ap.add_argument("--num-classes", type=int, default=6)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--cga-epochs", type=int, default=4)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=56)
    a = ap.parse_args()
    os.makedirs(a.out, exist_ok=True)
    if not os.path.isdir(os.path.join(a.data, "train")):
        subprocess.run([sys.executable, "examples/make_shapes_dataset.py",
                        a.data, str(a.n_per_class), f"--{a.level}"],
                       check=True, cwd=REPO)

    # the dataset on disk is the ground truth (an existing --data dir may
    # predate this invocation's --level/--n-per-class): fingerprint it and
    # refuse a class-count mismatch instead of silently training a
    # wrong-sized head (e.g. --level easy generates 3 classes while the
    # default --num-classes is 6)
    train_dir = os.path.join(a.data, "train")
    classes = sorted(d for d in os.listdir(train_dir)
                     if os.path.isdir(os.path.join(train_dir, d)))
    if len(classes) != a.num_classes:
        sys.exit(f"--num-classes {a.num_classes} but {train_dir} holds "
                 f"{len(classes)} classes {classes}; pass --num-classes "
                 f"{len(classes)} or regenerate --data")
    results = {"config": vars(a), "runs": {}, "compare": {}}
    results["config"]["dataset_fingerprint"] = {
        "classes": classes,
        "train_per_class": {
            c: len(os.listdir(os.path.join(train_dir, c))) for c in classes},
        "val_per_class": {
            c: len(os.listdir(os.path.join(a.data, "validation", c)))
            for c in classes}}
    for seed in range(a.seeds):
        for dtype in ("float32", "bfloat16"):
            key = f"seed{seed}_{dtype}"
            print(f"=== {key}", flush=True)
            results["runs"][key] = chain(
                a.out, a.data, seed, dtype, a.epochs, a.cga_epochs,
                a.batch, a.steps, num_classes=a.num_classes)
            print(json.dumps(results["runs"][key]), flush=True)
            with open(os.path.join(a.out, "bf16_study.json"), "w") as f:
                json.dump(results, f, indent=1)
        results["compare"][f"seed{seed}"] = compare_arms(
            a.out, a.data, seed, num_classes=a.num_classes)
        with open(os.path.join(a.out, "bf16_study.json"), "w") as f:
            json.dump(results, f, indent=1)

    import numpy as np

    d = [results["runs"][f"seed{s}_bfloat16"]["top1_cga"]
         - results["runs"][f"seed{s}_float32"]["top1_cga"]
         for s in range(a.seeds)]
    fp = [results["runs"][f"seed{s}_float32"]["top1_cga"]
          for s in range(a.seeds)]
    results["summary"] = {
        "mean_top1_delta_bf16_minus_fp32": float(np.mean(d)),
        "per_seed_delta": d,
        "fp32_seed_sigma": float(np.std(fp, ddof=1)) if len(fp) > 1 else 0.0,
        "accept": bool(abs(np.mean(d)) <= max(
            0.2, (np.std(fp, ddof=1) if len(fp) > 1 else 0.0))),
    }
    with open(os.path.join(a.out, "bf16_study.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["summary"], indent=1))


if __name__ == "__main__":
    main()
