"""Host input-pipeline throughput: JPEG decode + full train augmentation.

The QAT step consumes ~1020 img/s/chip (bench.py); the host pipeline must
sustain that rate.  This measures the tf.data train pipeline (decode,
RandomResizedCrop, hflip, RandAugment m9-mstd0.5-inc1, normalize,
random-erasing) on real JPEGs, per CPU core — this box has ONE core, so
the per-core number times a production host's core count (TPU VM hosts
have 100+) is the relevant capacity figure.

Usage: python benchmarks/input_pipeline.py [data_dir] [--img-size 224]
       (defaults to the generated shapes dataset; run
        `python examples/make_shapes_dataset.py /tmp/shapes` first)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _measure_once(args) -> float:
    from ofq_tpu.data.pipeline import DataConfig, make_dataset

    cfg = DataConfig(
        data_dir=args.data_dir, img_size=args.img_size,
        batch_size=args.batch_size, aa="rand-m9-mstd0.5-inc1",
        reprob=0.25, seed=0)
    it = make_dataset(cfg, train=True)
    next(it)  # build + warm the pipeline
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < args.seconds:
        batch = next(it)
        n += batch["image"].shape[0]
    return n / (time.perf_counter() - t0)


def _worker_entry(args, workers: int):
    """Child process: pin tf.data to `workers` threads, print one rate.

    Thread limits must be set before TF initializes, hence the fresh
    process per point."""
    import tensorflow as tf

    tf.config.threading.set_intra_op_parallelism_threads(workers)
    tf.config.threading.set_inter_op_parallelism_threads(workers)
    print(json.dumps({"workers": workers,
                      "imgs_per_sec": round(_measure_once(args), 1)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir", nargs="?", default="/tmp/shapes")
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--seconds", type=float, default=15.0)
    ap.add_argument("--workers", type=int, default=None,
                    help="(internal) run ONE point with tf.data pinned to "
                         "this many threads and exit")
    ap.add_argument("--curve", action="store_true",
                    help="measure the worker-scaling curve 1,2,4,...,"
                         "ncores (each point in a fresh process so the "
                         "TF thread-pool limit actually applies); turns "
                         "the SCALING.md per-core extrapolation into a "
                         "measurement wherever >1 core exists")
    args = ap.parse_args()

    if args.workers is not None:
        _worker_entry(args, args.workers)
        return

    ncores = os.cpu_count() or 1
    if args.curve:
        import subprocess

        worker_counts = []
        w = 1
        while w <= ncores:
            worker_counts.append(w)
            w *= 2
        if worker_counts[-1] != ncores:
            worker_counts.append(ncores)

        def one_point(workers):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), args.data_dir,
                 "--img-size", str(args.img_size),
                 "--batch-size", str(args.batch_size),
                 "--seconds", str(args.seconds),
                 "--workers", str(workers)],
                capture_output=True, text=True)
            if out.returncode != 0:
                sys.exit(f"worker={workers} point failed:\n{out.stderr}")
            return json.loads(out.stdout.strip().splitlines()[-1])

        points = [one_point(w) for w in worker_counts]
        base = points[0]["imgs_per_sec"]
        print(json.dumps({
            "curve": points,
            "cores": ncores,
            "parallel_efficiency_at_max": round(
                points[-1]["imgs_per_sec"]
                / (base * points[-1]["workers"]), 3) if base else None,
            "img_size": args.img_size,
            "aug": "rrc+hflip+randaug(m9)+erasing",
        }))
        return

    rate = _measure_once(args)
    print(json.dumps({
        "imgs_per_sec": round(rate, 1),
        "imgs_per_sec_per_core": round(rate / ncores, 1),
        "cores": ncores,
        "img_size": args.img_size,
        "aug": "rrc+hflip+randaug(m9)+erasing",
    }))


if __name__ == "__main__":
    main()
