"""Generate a tiny shapes ImageFolder dataset (circle/square/triangle).

Stands in for ImageNet on machines without it: real JPEGs through the real
tf.data pipeline, so `ofq_tpu.cli.train <dir> --num-classes 3 ...` exercises
the full decode/augment/train/eval path and must reach high accuracy.

Usage: python examples/make_shapes_dataset.py [out_dir] [n_per_class]
"""

import os
import sys

import numpy as np
from PIL import Image, ImageDraw


def render(kind: str, rng, size: int = 64) -> Image.Image:
    img = Image.new("RGB", (size, size),
                    tuple(rng.integers(0, 80, 3).tolist()))
    d = ImageDraw.Draw(img)
    color = tuple(rng.integers(120, 255, 3).tolist())
    c = rng.integers(size // 3, 2 * size // 3, 2)
    r = int(rng.integers(size // 6, size // 3))
    x, y = int(c[0]), int(c[1])
    if kind == "circle":
        d.ellipse([x - r, y - r, x + r, y + r], fill=color)
    elif kind == "square":
        d.rectangle([x - r, y - r, x + r, y + r], fill=color)
    else:  # triangle
        d.polygon([(x, y - r), (x - r, y + r), (x + r, y + r)], fill=color)
    return img


def main(out_dir: str = "/tmp/shapes", n: int = 200):
    rng = np.random.default_rng(0)
    for split, count in (("train", n), ("validation", max(n // 4, 8))):
        for kind in ("circle", "square", "triangle"):
            d = os.path.join(out_dir, split, kind)
            os.makedirs(d, exist_ok=True)
            for i in range(count):
                render(kind, rng).save(os.path.join(d, f"{i:04d}.jpeg"),
                                       quality=90)
    print(f"wrote shapes dataset to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/shapes",
         int(sys.argv[2]) if len(sys.argv) > 2 else 200)
