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


HARD_KINDS = ("circle", "square", "triangle", "pentagon", "star", "cross")

# Difficulty knobs for render_hard.  "hard" is the original round-4 tuning;
# the fp32 probe showed it lands DeiT-T-from-scratch at chance (~17-24%
# top-1 in the study's step budget), which is as undecidable as saturation.
# "medium" keeps the 6 confusable rotated classes but guarantees figure/
# ground contrast and moderates noise so the task is learnable from ~2k
# images without saturating at 100%.
LEVELS = {
    "hard": dict(bg_max=120, color_min=70, min_contrast=0, r_min=7,
                 noise_lo=10, noise_hi=55, occlude_p=0.3, distract_max=4,
                 jpeg_lo=40, jpeg_hi=91),
    "medium": dict(bg_max=90, color_min=120, min_contrast=60, r_min=12,
                   noise_lo=5, noise_hi=25, occlude_p=0.15, distract_max=2,
                   jpeg_lo=60, jpeg_hi=91),
}


def _regular_polygon(x, y, r, n_sides, rot):
    import math

    return [(x + r * math.cos(rot + 2 * math.pi * k / n_sides),
             y + r * math.sin(rot + 2 * math.pi * k / n_sides))
            for k in range(n_sides)]


def render_hard(kind: str, rng, size: int = 64,
                level: str = "hard") -> Image.Image:
    """Harder variant for the bf16 accuracy study (verdict r3 weak #2):
    6 confusable classes, random rotation/size, additive noise, distractor
    strokes, occasional occluding bar, jittered JPEG quality — tuned (via
    LEVELS[level]) so fp32 does NOT saturate at 100% and a 1500+ image val
    split resolves sub-0.1% accuracy differences."""
    import math

    p = LEVELS[level]
    bg = tuple(rng.integers(0, p["bg_max"], 3).tolist())
    img = Image.new("RGB", (size, size), bg)
    d = ImageDraw.Draw(img)
    while True:
        color = tuple(rng.integers(p["color_min"], 255, 3).tolist())
        lum = lambda c: 0.299 * c[0] + 0.587 * c[1] + 0.114 * c[2]
        if lum(color) - lum(bg) >= p["min_contrast"]:
            break
    x, y = (int(v) for v in rng.integers(size // 3, 2 * size // 3, 2))
    r = int(rng.integers(p["r_min"], size // 3))
    rot = float(rng.uniform(0, 2 * math.pi))
    if kind == "circle":
        d.ellipse([x - r, y - r, x + r, y + r], fill=color)
    elif kind == "square":
        d.polygon(_regular_polygon(x, y, r, 4, rot), fill=color)
    elif kind == "triangle":
        d.polygon(_regular_polygon(x, y, r, 3, rot), fill=color)
    elif kind == "pentagon":
        d.polygon(_regular_polygon(x, y, r, 5, rot), fill=color)
    elif kind == "star":
        pts = []
        for k in range(10):
            rr = r if k % 2 == 0 else max(2, int(0.45 * r))
            pts.append((x + rr * math.cos(rot + math.pi * k / 5),
                        y + rr * math.sin(rot + math.pi * k / 5)))
        d.polygon(pts, fill=color)
    else:  # cross: two rotated bars
        w = max(2, r // 3)
        for ang in (rot, rot + math.pi / 2):
            dx, dy = math.cos(ang), math.sin(ang)
            px, py = -dy * w, dx * w
            d.polygon([(x - r * dx + px, y - r * dy + py),
                       (x + r * dx + px, y + r * dy + py),
                       (x + r * dx - px, y + r * dy - py),
                       (x - r * dx - px, y - r * dy - py)], fill=color)
    # distractor strokes (never class-shaped)
    for _ in range(int(rng.integers(0, p["distract_max"]))):
        x0, y0, x1, y1 = rng.integers(0, size, 4)
        d.line([int(x0), int(y0), int(x1), int(y1)],
               fill=tuple(rng.integers(0, 255, 3).tolist()), width=1)
    # occluding bar
    if rng.uniform() < p["occlude_p"]:
        if rng.uniform() < 0.5:
            x0 = int(rng.integers(0, size))
            d.rectangle([x0, 0, min(size, x0 + int(rng.integers(2, 7))),
                         size], fill=bg)
        else:
            y0 = int(rng.integers(0, size))
            d.rectangle([0, y0, size,
                         min(size, y0 + int(rng.integers(2, 7)))], fill=bg)
    # additive pixel noise
    arr = np.asarray(img, np.int16)
    amp = int(rng.integers(p["noise_lo"], p["noise_hi"]))
    arr = np.clip(arr + rng.integers(-amp, amp + 1, arr.shape), 0, 255)
    return Image.fromarray(arr.astype(np.uint8))


def main(out_dir: str = "/tmp/shapes", n: int = 200, level: str = "easy"):
    rng = np.random.default_rng(0)
    graded = level in LEVELS
    kinds = HARD_KINDS if graded else ("circle", "square", "triangle")
    n_val = n if graded else max(n // 4, 8)  # graded: full-size val split
    # so accuracy resolves below 0.1% (bf16 study needs >=1500 val images)
    for split, count in (("train", n), ("validation", n_val)):
        for kind in kinds:
            d = os.path.join(out_dir, split, kind)
            os.makedirs(d, exist_ok=True)
            for i in range(count):
                if graded:
                    q = int(rng.integers(LEVELS[level]["jpeg_lo"],
                                         LEVELS[level]["jpeg_hi"]))
                    img = render_hard(kind, rng, level=level)
                else:
                    q, img = 90, render(kind, rng)
                img.save(os.path.join(d, f"{i:04d}.jpeg"), quality=q)
    print(f"wrote {level} shapes dataset to {out_dir} "
          f"({len(kinds)} classes, {n}/cls train, {n_val}/cls val)")


if __name__ == "__main__":
    lvl = "easy"
    for name in LEVELS:
        if f"--{name}" in sys.argv:
            lvl = name
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(argv[0] if argv else "/tmp/shapes",
         int(argv[1]) if len(argv) > 1 else 200,
         level=lvl)
