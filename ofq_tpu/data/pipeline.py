"""ImageNet input pipeline: tf.data host-side, NHWC device tensors.

Replaces the reference's timm loader + torchvision ImageFolder + CPU worker
processes (reference: train.py:574-650 `create_dataset`/`create_loader`,
plus the timm_fix_imagenet_loading_bugs patch).  Transform parity with the
shipped recipe (configs/ours_imagenet_recipe.attn_q.yml:1-26):

  train: RandomResizedCrop(224, scale=(0.08, 1.0), bicubic/random interp)
         -> hflip(0.5) -> RandAugment(m9-mstd0.5-inc1) -> normalize
         -> RandomErasing(p=0.25, mode='pixel')
  eval:  resize(shorter -> floor(224/0.9)=248, bicubic) -> center-crop 224
         -> normalize

A synthetic dataset backs benches/tests/smoke runs on machines without
ImageNet (this box has none).  Layout is NHWC throughout, sharded on the
batch axis by the caller.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Iterator, Optional, Tuple

import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    data_dir: Optional[str] = None      # None -> synthetic
    img_size: int = 224
    batch_size: int = 128
    num_classes: int = 1000
    crop_pct: float = 0.9
    scale: Tuple[float, float] = (0.08, 1.0)
    aa: Optional[str] = "rand-m9-mstd0.5-inc1"
    reprob: float = 0.25
    hflip: float = 0.5
    mean: Tuple[float, ...] = IMAGENET_MEAN
    std: Tuple[float, ...] = IMAGENET_STD
    shuffle_buffer: int = 16384
    seed: int = 42
    synthetic_length: int = 1024
    # timm RepeatAugSampler analog (train.py:233 num_aug_repeats): each
    # image appears `num_aug_repeats` times per pass, each copy drawing
    # independent augmentations.
    num_aug_repeats: int = 0
    # multi-host: disjoint per-host file partition (DistributedSampler
    # semantics, reference train.py:625) — a common-seed permutation of the
    # listing strided by host, so an assembled global batch is duplicate-free
    # and an epoch covers each sample exactly once.  Eval shards are padded
    # to equal length with label=-1 sentinels (masked out by the eval step).
    shard_index: int = 0
    shard_count: int = 1
    # calibration mode: TRAIN split with the DETERMINISTIC eval transform
    # (resize + center crop, no random draws) — LSQ scale init must be
    # identical on every pod host and the train augmentations are unseeded
    eval_transform: bool = False


def _parse_rand_augment(aa: str) -> tuple[int, float, float]:
    """'rand-m9-mstd0.5-inc1' -> (num_ops=2, magnitude=9, std=0.5)."""
    num_ops, mag, std = 2, 9.0, 0.5
    for part in aa.split("-")[1:]:
        if part.startswith("mstd"):
            std = float(part[4:])
        elif part.startswith("m"):
            mag = float(part[1:])
        elif part.startswith("n"):
            num_ops = int(part[1:])
    return num_ops, mag, std


def synthetic_batches(cfg: DataConfig, *, train: bool) -> Iterator[dict]:
    """Deterministic synthetic data stream (normalized stats)."""
    rng = np.random.default_rng(
        cfg.seed + 10007 * cfg.shard_index + (0 if train else 1))
    steps = max(cfg.synthetic_length // cfg.batch_size, 1)
    for _ in range(steps):
        yield {
            "image": rng.normal(size=(
                cfg.batch_size, cfg.img_size, cfg.img_size, 3)
            ).astype(np.float32),
            "label": rng.integers(
                0, cfg.num_classes, size=(cfg.batch_size,)).astype(np.int32),
        }


def _tf():
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    try:
        tf.config.set_visible_devices([], "TPU")
    except Exception:
        pass
    return tf


import functools


@functools.lru_cache(maxsize=8)
def _list_imagefolder(data_dir: str, split: str):
    """ImageFolder layout: <root>/<split>/<class>/<img> (listing cached:
    validation re-listing every epoch costs minutes on networked FS)."""
    split_dir = os.path.join(data_dir, split)
    if not os.path.isdir(split_dir) and split == "validation":
        split_dir = os.path.join(data_dir, "val")
    classes = sorted(
        d for d in os.listdir(split_dir)
        if os.path.isdir(os.path.join(split_dir, d)))
    class_idx = {c: i for i, c in enumerate(classes)}
    files, labels = [], []
    for c in classes:
        cdir = os.path.join(split_dir, c)
        for f in sorted(os.listdir(cdir)):
            files.append(os.path.join(cdir, f))
            labels.append(class_idx[c])
    return files, labels, classes


def num_samples(cfg: DataConfig, *, train: bool) -> int:
    """Sample count for epoch sizing (ImageFolder listing or synthetic)."""
    if cfg.data_dir is None or cfg.data_dir in ("synthetic", ""):
        return cfg.synthetic_length
    files, _, _ = _list_imagefolder(
        cfg.data_dir, "train" if train else "validation")
    # NOTE: with num_aug_repeats the epoch length stays len(files) (timm
    # RepeatAugSampler semantics: same steps/epoch, 1/reps distinct images).
    return len(files)


def rrc_crop_params(tf, h, w, scale):
    """torchvision RandomResizedCrop.get_params: up to 10 proposal
    draws accepted when the crop fits, else aspect-clamped center crop;
    offsets sampled inclusively (randint(0, dim - crop + 1)).

    Module-level so tests can verify its (top, left, ch, cw) distribution
    statistically against torchvision's get_params
    (tests/test_aug_differential.py)."""
    log_ratio = (math.log(3 / 4), math.log(4 / 3))
    area = tf.cast(h * w, tf.float32)

    def body(i, ok, t, l, c_h, c_w):
        target = tf.random.uniform([], scale[0], scale[1]) * area
        ar = tf.exp(tf.random.uniform([], *log_ratio))
        nw = tf.cast(tf.round(tf.sqrt(target * ar)), tf.int32)
        nh = tf.cast(tf.round(tf.sqrt(target / ar)), tf.int32)
        valid = (nh > 0) & (nw > 0) & (nh <= h) & (nw <= w)
        nt = tf.cond(
            valid,
            lambda: tf.random.uniform([], 0, h - nh + 1, tf.int32),
            lambda: t)
        nl = tf.cond(
            valid,
            lambda: tf.random.uniform([], 0, w - nw + 1, tf.int32),
            lambda: l)
        return (i + 1, ok | valid, nt, nl,
                tf.where(valid, nh, c_h), tf.where(valid, nw, c_w))

    _, ok, t, l, c_h, c_w = tf.while_loop(
        lambda i, ok, *_: (i < 10) & tf.logical_not(ok), body,
        (tf.constant(0), tf.constant(False),
         tf.constant(0), tf.constant(0), tf.constant(0), tf.constant(0)))

    def fallback():
        in_ratio = tf.cast(w, tf.float32) / tf.cast(h, tf.float32)
        fw, fh = tf.cond(
            in_ratio < 3 / 4,
            lambda: (w, tf.cast(
                tf.round(tf.cast(w, tf.float32) / (3 / 4)), tf.int32)),
            lambda: tf.cond(
                in_ratio > 4 / 3,
                lambda: (tf.cast(
                    tf.round(tf.cast(h, tf.float32) * (4 / 3)), tf.int32),
                    h),
                lambda: (w, h)))
        return (h - fh) // 2, (w - fw) // 2, fh, fw

    return tf.cond(ok, lambda: (t, l, c_h, c_w), fallback)


def make_dataset(cfg: DataConfig, *, train: bool):
    """Returns an iterator of {'image': f32 NHWC, 'label': i32} numpy batches."""
    if cfg.data_dir is None or cfg.data_dir in ("synthetic", ""):
        def gen():
            while True:
                yield from synthetic_batches(cfg, train=train)
        if train:
            return gen()
        return synthetic_batches(cfg, train=False)

    tf = _tf()
    from .augment import rand_augment, random_erasing

    files, labels, _ = _list_imagefolder(
        cfg.data_dir, "train" if train else "validation")
    if cfg.shard_count > 1:
        order = np.random.default_rng(cfg.seed).permutation(len(files))
        if not train:
            # equal per-host stream lengths keep the assembled global arrays
            # rectangular; padding entries carry label -1 (eval masks them)
            pad = (-len(order)) % cfg.shard_count
            files = [files[i] for i in order] + [files[order[0]]] * pad
            labels = [labels[i] for i in order] + [-1] * pad
        else:
            files = [files[i] for i in order]
            labels = [labels[i] for i in order]
        files = files[cfg.shard_index::cfg.shard_count]
        labels = labels[cfg.shard_index::cfg.shard_count]
    ds = tf.data.Dataset.from_tensor_slices((files, labels))
    if train:
        ds = ds.shuffle(min(len(files), cfg.shuffle_buffer),
                        seed=cfg.seed, reshuffle_each_iteration=True)
        if cfg.num_aug_repeats > 0:
            reps = cfg.num_aug_repeats
            ds = ds.flat_map(
                lambda f, l: tf.data.Dataset.from_tensors((f, l)).repeat(reps))
        ds = ds.repeat()

    mean = tf.constant(cfg.mean, tf.float32) * 255.0
    std = tf.constant(cfg.std, tf.float32) * 255.0
    size = cfg.img_size

    def rrc_params(h, w):
        return rrc_crop_params(tf, h, w, cfg.scale)

    def load_train(path, label):
        # decode_image, not decode_jpeg: ImageNet train famously contains
        # mislabeled non-JPEG files (e.g. n02105855_2933.JPEG is a PNG)
        # which PIL (the reference loader) decodes and decode_jpeg
        # rejects mid-epoch; decode_image handles JPEG/PNG/BMP/GIF
        img = tf.io.decode_image(tf.io.read_file(path), channels=3,
                                 expand_animations=False)
        shape = tf.shape(img)
        top, left, ch, cw = rrc_params(shape[0], shape[1])
        img = img[top:top + ch, left:left + cw]
        # 'random' train interpolation: bicubic or bilinear per-sample
        method = tf.random.uniform([], 0, 2, tf.int32)
        img = tf.cond(
            method == 0,
            lambda: tf.image.resize(img, (size, size), method="bicubic"),
            lambda: tf.image.resize(img, (size, size), method="bilinear"))
        img = tf.saturate_cast(img, tf.uint8)
        img = tf.cond(tf.random.uniform([]) < cfg.hflip,
                      lambda: tf.image.flip_left_right(img), lambda: img)
        if cfg.aa:
            n, m, s = _parse_rand_augment(cfg.aa)
            img = rand_augment(img, n, m, s)
        img = (tf.cast(img, tf.float32) - mean) / std
        if cfg.reprob > 0:
            img = random_erasing(img, cfg.reprob)
        img.set_shape((size, size, 3))
        return img, tf.cast(label, tf.int32)

    def load_eval(path, label):
        # decode_image, not decode_jpeg: ImageNet train famously contains
        # mislabeled non-JPEG files (e.g. n02105855_2933.JPEG is a PNG)
        # which PIL (the reference loader) decodes and decode_jpeg
        # rejects mid-epoch; decode_image handles JPEG/PNG/BMP/GIF
        img = tf.io.decode_image(tf.io.read_file(path), channels=3,
                                 expand_animations=False)
        shape = tf.shape(img)
        scale_size = int(math.floor(size / cfg.crop_pct))
        short = tf.minimum(shape[0], shape[1])
        ratio = tf.cast(scale_size, tf.float32) / tf.cast(short, tf.float32)
        nh = tf.cast(tf.round(tf.cast(shape[0], tf.float32) * ratio), tf.int32)
        nw = tf.cast(tf.round(tf.cast(shape[1], tf.float32) * ratio), tf.int32)
        img = tf.image.resize(img, (nh, nw), method="bicubic")
        # PIL resizes in uint8: clamp the bicubic overshoot and round so
        # eval inputs match the reference's uint8 pipeline
        img = tf.round(tf.clip_by_value(img, 0.0, 255.0))
        top = (nh - size) // 2
        left = (nw - size) // 2
        img = img[top:top + size, left:left + size]
        img = (img - mean) / std
        img.set_shape((size, size, 3))
        return img, tf.cast(label, tf.int32)

    use_train_tf = train and not cfg.eval_transform
    ds = ds.map(load_train if use_train_tf else load_eval,
                num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.batch(cfg.batch_size, drop_remainder=train)
    ds = ds.prefetch(tf.data.AUTOTUNE)

    def to_numpy():
        for img, lab in ds.as_numpy_iterator():
            yield {"image": img, "label": lab}

    return to_numpy()


def mixup_cutmix(batch, rng_key, *, mixup_alpha: float = 0.8,
                 cutmix_alpha: float = 1.0, prob: float = 1.0,
                 switch_prob: float = 0.5, num_classes: int = 1000,
                 label_smoothing: float = 0.1):
    """Device-side mixup/cutmix producing soft labels (timm Mixup analog,
    train.py:604-613).  Pure function for use inside the jitted step."""
    import jax
    import jax.numpy as jnp

    x, y = batch["image"], batch["label"]
    B = x.shape[0]
    k1, k2, k3, k4, k5, k6 = jax.random.split(rng_key, 6)
    off = label_smoothing / num_classes
    on = 1.0 - label_smoothing + off
    y1 = jax.nn.one_hot(y, num_classes) * (on - off) + off
    perm = jnp.flip(jnp.arange(B))  # timm 'batch' mode pairs with flipped batch
    use_mix = jax.random.uniform(k1) < prob
    # timm Mixup only flips a coin between the two modes when BOTH alphas
    # are active; a zero alpha would make jax.random.beta return NaN.
    if mixup_alpha > 0.0 and cutmix_alpha > 0.0:
        use_cutmix = jax.random.uniform(k2) < switch_prob
    else:
        use_cutmix = jnp.asarray(cutmix_alpha > 0.0)

    lam_mix = jax.random.beta(k3, max(mixup_alpha, 1e-8), max(mixup_alpha, 1e-8))
    lam_cut = jax.random.beta(k4, max(cutmix_alpha, 1e-8), max(cutmix_alpha, 1e-8))

    H, W = x.shape[1], x.shape[2]
    rh = jnp.sqrt(1.0 - lam_cut)
    ch, cw = jnp.int32(H * rh), jnp.int32(W * rh)
    cy = jax.random.randint(k5, (), 0, H)
    cx = jax.random.randint(k6, (), 0, W)
    y0c = jnp.clip(cy - ch // 2, 0, H)
    x0c = jnp.clip(cx - cw // 2, 0, W)
    y1c = jnp.clip(cy + ch // 2, 0, H)
    x1c = jnp.clip(cx + cw // 2, 0, W)
    rows = jnp.arange(H)[None, :, None, None]
    cols = jnp.arange(W)[None, None, :, None]
    box = ((rows >= y0c) & (rows < y1c) & (cols >= x0c) & (cols < x1c))
    lam_cut_adj = 1.0 - ((y1c - y0c) * (x1c - x0c)) / (H * W)

    x_mix = lam_mix * x + (1 - lam_mix) * x[perm]
    x_cut = jnp.where(box, x[perm], x)
    lam = jnp.where(use_cutmix, lam_cut_adj, lam_mix)
    x_out = jnp.where(use_cutmix, x_cut, x_mix)
    y_out = lam * y1 + (1 - lam) * y1[perm]
    x_final = jnp.where(use_mix, x_out, x)
    y_final = jnp.where(use_mix, y_out, y1)
    return {"image": x_final, "label": batch["label"], "soft_label": y_final}
