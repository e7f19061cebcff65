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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_dir", nargs="?", default="/tmp/shapes")
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--seconds", type=float, default=15.0)
    args = ap.parse_args()

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
    dt = time.perf_counter() - t0
    ncores = os.cpu_count() or 1
    print(json.dumps({
        "imgs_per_sec": round(n / dt, 1),
        "imgs_per_sec_per_core": round(n / dt / ncores, 1),
        "cores": ncores,
        "img_size": args.img_size,
        "aug": "rrc+hflip+randaug(m9)+erasing",
    }))


if __name__ == "__main__":
    main()
