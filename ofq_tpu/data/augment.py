"""Host-side augmentations in tf.data: RandAugment + random erasing.

Replaces the reference's timm CPU-worker pipeline (reference:
train.py:574-650 with `aa: rand-m9-mstd0.5-inc1`, `reprob: 0.25`,
`remode: pixel` from configs/ours_imagenet_recipe.attn_q.yml:18-26).
Augmentation runs on host via tf.data so the TPU only sees normalized
NHWC float tensors.

The RandAugment here implements the timm policy semantics: 2 ops per
image sampled uniformly from the op set, magnitude 9 on the 0-10 scale
with gaussian std 0.5, 'inc' (increasing) magnitude-to-strength mapping.
"""

from __future__ import annotations

import math

import tensorflow as tf

_MAX_LEVEL = 10.0


def _randomize_mag(mag, std):
    if std <= 0:
        return tf.constant(mag, tf.float32)
    m = tf.random.normal([], mean=mag, stddev=std)
    return tf.clip_by_value(m, 0.0, _MAX_LEVEL)


def _blend(a, b, factor):
    return tf.saturate_cast(
        tf.cast(a, tf.float32) + factor * (tf.cast(b, tf.float32) - tf.cast(a, tf.float32)),
        tf.uint8)


def _autocontrast(img):
    def scale_channel(ch):
        lo = tf.cast(tf.reduce_min(ch), tf.float32)
        hi = tf.cast(tf.reduce_max(ch), tf.float32)

        def scaled():
            scale = 255.0 / (hi - lo)
            return tf.saturate_cast((tf.cast(ch, tf.float32) - lo) * scale, tf.uint8)

        return tf.cond(hi > lo, scaled, lambda: ch)

    return tf.stack([scale_channel(img[..., c]) for c in range(3)], axis=-1)


def _equalize(img):
    def eq_channel(ch):
        histo = tf.histogram_fixed_width(tf.cast(ch, tf.int32), [0, 255], nbins=256)
        nonzero = tf.boolean_mask(histo, histo != 0)
        step = (tf.reduce_sum(nonzero) - nonzero[-1]) // 255

        def build_lut():
            lut = (tf.cumsum(histo) + (step // 2)) // step
            lut = tf.concat([[0], lut[:-1]], 0)
            return tf.clip_by_value(lut, 0, 255)

        return tf.cond(
            step == 0,
            lambda: ch,
            lambda: tf.gather(
                tf.cast(build_lut(), tf.uint8), tf.cast(ch, tf.int32)))

    return tf.stack([eq_channel(img[..., c]) for c in range(3)], axis=-1)


def _invert(img):
    return 255 - img


def _posterize(img, mag):
    # timm PosterizeIncreasing: keep 4 - int(m/10*4) bits (1 bit at m=9).
    # NB: the int() truncation applies to m/10*4, NOT to the difference —
    # truncating the difference would keep 0 bits and black the image out.
    bits_kept = 4 - tf.cast((mag / _MAX_LEVEL) * 4.0, tf.int32)
    shift = tf.clip_by_value(8 - bits_kept, 0, 8)
    return tf.bitwise.left_shift(
        tf.bitwise.right_shift(tf.cast(img, tf.int32), shift), shift)


def _solarize(img, mag):
    thresh = tf.cast(256.0 - (mag / _MAX_LEVEL) * 256.0, tf.int32)
    i = tf.cast(img, tf.int32)
    return tf.saturate_cast(tf.where(i < thresh, i, 255 - i), tf.uint8)


def _solarize_add(img, mag):
    add = tf.cast((mag / _MAX_LEVEL) * 110.0, tf.int32)
    i = tf.cast(img, tf.int32)
    return tf.saturate_cast(tf.where(i < 128, i + add, i), tf.uint8)


def _enhance_factor(mag):
    # 'inc' mapping: factor = 1 +/- 0.9*mag/10
    sign = tf.where(tf.random.uniform([]) < 0.5, -1.0, 1.0)
    return 1.0 + sign * (mag / _MAX_LEVEL) * 0.9


def _color(img, mag):
    gray = tf.image.grayscale_to_rgb(tf.image.rgb_to_grayscale(img))
    return _blend(gray, img, _enhance_factor(mag))


def _contrast(img, mag):
    mean = tf.reduce_mean(tf.cast(tf.image.rgb_to_grayscale(img), tf.float32))
    mean_img = tf.saturate_cast(tf.fill(tf.shape(img), mean), tf.uint8)
    return _blend(mean_img, img, _enhance_factor(mag))


def _brightness(img, mag):
    return _blend(tf.zeros_like(img), img, _enhance_factor(mag))


def _sharpness(img, mag):
    f = tf.cast(img, tf.float32)[None]
    kernel = tf.constant(
        [[1, 1, 1], [1, 5, 1], [1, 1, 1]], tf.float32)[:, :, None, None] / 13.0
    kernel = tf.tile(kernel, [1, 1, 3, 1])
    smooth = tf.nn.depthwise_conv2d(f, kernel, [1, 1, 1, 1], "VALID")
    smooth = tf.pad(smooth, [[0, 0], [1, 1], [1, 1], [0, 0]], "SYMMETRIC")[0]
    smooth = tf.saturate_cast(smooth, tf.uint8)
    return _blend(smooth, img, _enhance_factor(mag))


# timm/PIL affine ops fill vacated pixels with fillcolor=(128,128,128);
# out-of-range source indices map to this constant instead of wrapping.
_FILL = 128


def _gather_cols(img, shifts):
    """new[r, c] = img[r, c - shifts[r]], constant-fill out of range."""
    w = tf.shape(img)[1]
    raw = tf.range(w)[None, :] - shifts[:, None]
    valid = (raw >= 0) & (raw < w)
    idx = tf.clip_by_value(raw, 0, w - 1)
    out = tf.gather(img, idx, axis=1, batch_dims=1)
    return tf.where(valid[:, :, None], out, tf.cast(_FILL, img.dtype))


def _gather_rows(img, shifts):
    t = tf.transpose(img, [1, 0, 2])
    return tf.transpose(_gather_cols(t, shifts), [1, 0, 2])


def _translate(img, mag, horizontal):
    frac = (mag / _MAX_LEVEL) * 0.45
    sign = tf.where(tf.random.uniform([]) < 0.5, -1.0, 1.0)
    h = tf.shape(img)[0]
    w = tf.shape(img)[1]
    size = tf.cast(w if horizontal else h, tf.float32)
    pix = tf.cast(sign * frac * size, tf.int32)
    if horizontal:
        return _gather_cols(img, tf.fill([h], pix))
    return _gather_rows(img, tf.fill([w], pix))


def _shear(img, mag, horizontal):
    # shear via per-row/col shifted gather (keeps everything tf-native)
    frac = (mag / _MAX_LEVEL) * 0.3
    sign = tf.where(tf.random.uniform([]) < 0.5, -1.0, 1.0)
    h = tf.shape(img)[0]
    w = tf.shape(img)[1]
    if horizontal:
        shifts = tf.cast(
            sign * frac * tf.cast(tf.range(h), tf.float32), tf.int32)
        return _gather_cols(img, shifts)
    shifts = tf.cast(sign * frac * tf.cast(tf.range(w), tf.float32), tf.int32)
    return _gather_rows(img, shifts)


def _rotate(img, mag):
    # rotations in RandAugment are <=30deg; approximate with shear-rotate
    # decomposition (3 shears) to stay in pure tf ops.
    deg = (mag / _MAX_LEVEL) * 30.0
    sign = tf.where(tf.random.uniform([]) < 0.5, -1.0, 1.0)
    rad = sign * deg * math.pi / 180.0
    img = _shear_by(img, -tf.tan(rad / 2.0), horizontal=True)
    img = _shear_by(img, tf.sin(rad), horizontal=False)
    img = _shear_by(img, -tf.tan(rad / 2.0), horizontal=True)
    return img


def _shear_by(img, factor, horizontal):
    h = tf.shape(img)[0]
    w = tf.shape(img)[1]
    if horizontal:
        shifts = tf.cast(factor * tf.cast(tf.range(h) - h // 2, tf.float32),
                         tf.int32)
        return _gather_cols(img, shifts)
    shifts = tf.cast(factor * tf.cast(tf.range(w) - w // 2, tf.float32),
                     tf.int32)
    return _gather_rows(img, shifts)


def rand_augment(img: tf.Tensor, num_ops: int = 2, magnitude: float = 9.0,
                 mag_std: float = 0.5) -> tf.Tensor:
    """Apply `num_ops` randomly chosen ops at (noisy) magnitude. uint8 HWC."""
    ops = [
        lambda im, m: _autocontrast(im),
        lambda im, m: _equalize(im),
        lambda im, m: _invert(im),
        _rotate,
        lambda im, m: tf.saturate_cast(_posterize(im, m), tf.uint8),
        _solarize,
        _solarize_add,
        _color,
        _contrast,
        _brightness,
        _sharpness,
        lambda im, m: _shear(im, m, True),
        lambda im, m: _shear(im, m, False),
        lambda im, m: _translate(im, m, True),
        lambda im, m: _translate(im, m, False),
    ]
    for _ in range(num_ops):
        mag = _randomize_mag(magnitude, mag_std)
        op_idx = tf.random.uniform([], 0, len(ops), tf.int32)
        cur = img
        # timm creates every AugmentOp with prob=0.5: each chosen op is a
        # coin-flip no-op, halving effective augmentation strength.
        img = tf.cond(
            tf.random.uniform([]) < 0.5,
            lambda: tf.switch_case(
                op_idx,
                [(lambda op=op, im=cur, m=mag: op(im, m)) for op in ops]),
            lambda: cur)
    return img


def random_erasing(img: tf.Tensor, prob: float = 0.25,
                   area_range=(0.02, 1 / 3), aspect_range=(0.3, 10 / 3),
                   ) -> tf.Tensor:
    """timm 'pixel'-mode random erasing: rectangle filled with gaussian
    noise, applied on the *normalized* float image (train.py reprob/remode).
    """
    h = tf.shape(img)[0]
    w = tf.shape(img)[1]

    def erase():
        # timm retries up to 10 draws and SKIPS if no rectangle fits —
        # clamping an oversized draw instead would erase far above the
        # 1/3 max-area bound (a 10/3-aspect draw at max area clamps to
        # ~57% of a 224px image).  Draw the 10 candidates up front and
        # take the first that fits strictly inside the image.
        area = tf.cast(h * w, tf.float32)
        target = tf.random.uniform([10], *area_range) * area
        ar = tf.exp(tf.random.uniform(
            [10], tf.math.log(aspect_range[0]), tf.math.log(aspect_range[1])))
        eh_c = tf.cast(tf.round(tf.sqrt(target * ar)), tf.int32)
        ew_c = tf.cast(tf.round(tf.sqrt(target / ar)), tf.int32)
        fits = (eh_c < h) & (ew_c < w) & (eh_c > 0) & (ew_c > 0)
        idx = tf.argmax(tf.cast(fits, tf.int32), output_type=tf.int32)

        def apply_erase():
            eh = eh_c[idx]
            ew = ew_c[idx]
            # timm: random.randint(0, h - eh) is INCLUSIVE of both ends
            top = tf.random.uniform([], 0, h - eh + 1, tf.int32)
            left = tf.random.uniform([], 0, w - ew + 1, tf.int32)
            mask = tf.pad(
                tf.ones([eh, ew, 1], tf.float32),
                [[top, h - top - eh], [left, w - left - ew], [0, 0]])
            noise = tf.random.normal(tf.shape(img))
            return img * (1.0 - mask) + noise * mask

        return tf.cond(tf.reduce_any(fits), apply_erase, lambda: img)

    return tf.cond(tf.random.uniform([]) < prob, erase, lambda: img)
