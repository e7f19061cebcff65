"""Deployment export: packed integer weights for OFQ-trained models.

A QAT checkpoint stores fp32 master weights; what a W2A2 model actually
*uses* at inference is 2-bit integer codes times per-channel scales.
This module freezes that representation into a compact artifact:

  * StatsQ kernels (qkv/proj/fc1/fc2/reduction, QKR's v) -> mid-rise codes
    k = round(clip(w/s, -1, 1-1e-6) * n - 0.5) in [-n, n-1], n = 2^(b-1),
    packed b bits each, plus the per-output-channel scale s = 2*mean|w|
    (reference: statsq.py:122-150).  Dequant s*((k + 0.5)/n) reproduces
    the training-time fake-quant values bit-exactly.
  * QKR q/k kernels -> the quantized per-head product W_qk (the tensor the
    forward actually consumes, reference attention.py:190-196), stored as
    codes under `w_qk_frozen`; q/k kernels are dropped.
  * LSQ-weight layers (W8 head / patch embed, and every block kernel
    under the full-LSQ `--wq-mode lsq` path) -> int codes with their
    learned scale.  These are idempotent under re-quantization (the scale
    is a stored parameter), so the model path is unchanged.
  * everything else (biases, LSQ activation scales, norms, embeddings)
    passes through in fp32.

Because StatsQ recomputes its scale from the live weights each forward,
restored kernels must NOT be re-quantized: inference models are built
with `dataclasses.replace(policy, weight_frozen=True)`, which skips
weight fake-quant and consumes `w_qk_frozen` directly.  Logit parity of
(train-policy model, master weights) vs (frozen-policy model, restored
artifact) is exact up to float associativity (tests/test_deploy.py).

The reference has no deployment story — its released artifacts are
full fp32 .pth.tar state_dicts.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional

import numpy as np

from .quant.statsq import _CLIP_HI_EPS

_STATSQ_PARENTS = ("qkv", "proj", "fc1", "fc2", "reduction")


def pack_codes(codes: np.ndarray, bits: int) -> np.ndarray:
    """Pack unsigned codes (< 2^bits) into a dense uint8 bitstream —
    exactly `bits` bits per code (so W3 packs at 3 bits, not 4)."""
    assert 1 <= bits <= 8
    flat = codes.astype(np.uint8).ravel()
    b = np.unpackbits(flat[:, None], axis=1)[:, 8 - bits:]
    return np.packbits(b.ravel())


def unpack_codes(packed: np.ndarray, bits: int, size: int) -> np.ndarray:
    b = np.unpackbits(np.asarray(packed, np.uint8))[:size * bits]
    b = b.reshape(size, bits)
    out = np.zeros(size, np.uint8)
    for i in range(bits):
        out |= b[:, i].astype(np.uint8) << (bits - 1 - i)
    return out


def _statsq_encode(w: np.ndarray, bits: int, reduce_axis: int):
    # The whole encode runs through jnp with the exact op sequence of
    # statsq_quantize: XLA's reductions AND its f32 divide differ from
    # numpy by 1 ulp (CPU lowers divide via reciprocal-multiply), which
    # flips boundary weights onto different levels — observed on real
    # checkpoints.  The decode stays numpy-safe: it divides only by the
    # power-of-two n and multiplies by s (exact IEEE single ops).
    import jax.numpy as jnp

    from .quant.statsq import statsq_scale

    wj = jnp.asarray(w, jnp.float32)
    sj = statsq_scale(wj, reduce_axis=reduce_axis)
    clipped = jnp.clip(wj / sj, -1.0, 1.0 - _CLIP_HI_EPS)
    n = float(2 ** (bits - 1))
    k = jnp.round(clipped * n - 0.5)  # in [-n, n-1]
    return (np.asarray(k) + n).astype(np.uint8), np.asarray(sj, np.float32)


def _statsq_decode(codes: np.ndarray, s: np.ndarray, bits: int) -> np.ndarray:
    n = float(2 ** (bits - 1))
    k = codes.astype(np.float32) - n
    return (s * ((k + 0.5) / n)).astype(np.float32)


def _lsq_encode(w: np.ndarray, s: np.ndarray, bits: int, axis: int,
                all_positive: bool = False):
    """LSQ weight codes with the LEARNED scale (kept as its own param).
    jnp ops mirror lsq_quantize exactly (see _statsq_encode on why).
    all_positive selects the unsigned [0, 2^b-1] range (--wq_asym,
    reference lsq.py:24-31); a size-1 scale broadcasts per-tensor
    (matching _broadcast_scale in quant/lsq.py)."""
    import jax.numpy as jnp

    s = np.asarray(s)
    if s.size == 1:
        sb = jnp.maximum(jnp.asarray(s, jnp.float32).reshape(()), 1e-5)
    else:
        shape = [1] * w.ndim
        shape[axis] = s.shape[0]
        sb = jnp.maximum(jnp.asarray(s, jnp.float32).reshape(shape), 1e-5)
    thd_neg, thd_pos = ((0, 2 ** bits - 1) if all_positive
                        else (-(2 ** (bits - 1)), 2 ** (bits - 1) - 1))
    k = jnp.round(jnp.clip(jnp.asarray(w, jnp.float32) / sb,
                           thd_neg, thd_pos))
    return ((np.asarray(k) - thd_neg).astype(np.uint8),
            np.asarray(sb, np.float32))


def _lsq_decode(codes, sb, bits, all_positive: bool = False):
    thd_neg = 0 if all_positive else -(2 ** (bits - 1))
    return (sb * (codes.astype(np.float32) + thd_neg)).astype(np.float32)


def _walk(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, prefix + (k,))
    else:
        yield prefix, tree


def _set(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def export_packed(params: dict, *, weight_bits: int, qk_reparam: bool,
                  num_heads: Optional[int] = None,
                  head_dim: int = 64, wq_mode: str = "statsq",
                  wq_asym: bool = False) -> dict:
    """Pack a trained param tree (the 'params' collection) into integer
    codes + scales + passthrough floats.  Returns a flat dict suitable for
    np.savez; `restore_packed` inverts it."""
    if not 2 <= weight_bits <= 8:
        # bits=1 is unrepresentable here: the mid-rise forward maps w=-s to
        # round(-1.5)=-2 under round-half-to-even, one below the [-n, n-1]
        # code range, so the uint8 cast would wrap to 255 and corrupt the
        # weight.  (The shipped recipes are W2/W3/W4; 1-bit StatsQ weights
        # exist in neither the reference nor this framework.)
        raise ValueError(f"packed export supports 2..8 weight bits, got "
                         f"{weight_bits}")
    out = {}
    meta = {"weight_bits": weight_bits, "qk_reparam": qk_reparam,
            "wq_mode": wq_mode, "wq_asym": wq_asym, "entries": {}}
    params = {k: np.asarray(v) if not isinstance(v, dict) else v
              for k, v in params.items()}
    flat = list(_walk(params))
    names = {p: v for p, v in flat}
    for path, w in flat:
        key = "/".join(path)
        leaf, parent = path[-1], (path[-2] if len(path) > 1 else "")
        w = np.asarray(w)
        if qk_reparam and leaf in ("q_kernel", "k_kernel"):
            if leaf == "k_kernel":
                continue  # handled with q_kernel
            k_w = np.asarray(names[path[:-1] + ("k_kernel",)])
            C = w.shape[0]
            # per-head dim is constant per family (DeiT 64, Swin 32) while
            # C varies per Swin stage, so H must be derived from head_dim
            H = num_heads if num_heads else max(C // head_dim, 1)
            d = C // H
            # the product contraction must run through jnp too — numpy's
            # accumulation order differs, shifting tie-boundary values
            import jax.numpy as jnp

            w_qk = np.asarray(jnp.einsum(
                "ihd,jhd->hij",
                jnp.asarray(w, jnp.float32).reshape(C, H, d),
                jnp.asarray(k_w, jnp.float32).reshape(C, H, d),
                precision="highest")).reshape(H * C, C)
            codes, s = _statsq_encode(w_qk, weight_bits, reduce_axis=-1)
            base = "/".join(path[:-1]) + "/w_qk_frozen"
            out[base + ".codes"] = pack_codes(codes, weight_bits)
            out[base + ".scale"] = s
            meta["entries"][base] = {
                "kind": "statsq", "bits": weight_bits,
                "shape": [H, C, C], "enc_shape": list(w_qk.shape)}
            continue
        if leaf == "v_kernel" and qk_reparam:
            codes, s = _statsq_encode(w, weight_bits, reduce_axis=0)
        elif (leaf == "kernel" and parent in _STATSQ_PARENTS
                and _is_lsq_sibling(names, path)):
            # full-LSQ block (--wq-mode lsq): the kernel's quantizer is an
            # LsqWeight with a LEARNED scale, so pack at weight_bits with
            # that scale.  Dequantized kernels are idempotent under
            # re-quantization AND the frozen policy (weight_bits=32) skips
            # the quantizer entirely — either path reproduces the trained
            # fake-quant values exactly.
            if wq_mode != "lsq":
                raise ValueError(
                    f"param tree has an LSQ weight scale under {key} but "
                    f"wq_mode={wq_mode!r}; pass wq_mode='lsq' (and wq_asym "
                    f"for --wq_asym runs) so codes use the learned scale "
                    f"at the right range")
            s_param = np.asarray(_lsq_weight_scale(names, path))
            codes, sb = _lsq_encode(w, s_param, weight_bits, axis=-1,
                                    all_positive=wq_asym)
            out[key + ".codes"] = pack_codes(codes, weight_bits)
            out[key + ".scale"] = sb
            meta["entries"][key] = {
                "kind": "lsq", "bits": weight_bits,
                "all_positive": wq_asym, "shape": list(w.shape),
                "enc_shape": list(w.shape)}
            continue
        elif (leaf == "kernel" and parent in _STATSQ_PARENTS
                and _in_quantized_module(names, path)):
            # StatsQ'd QLinear kernels; float Dense kernels in unquantized
            # blocks pass through untouched
            codes, s = _statsq_encode(w, weight_bits, reduce_axis=0)
        elif leaf == "kernel" and _lsq_weight_scale(names, path) is not None:
            s_param = _lsq_weight_scale(names, path)
            codes, sb = _lsq_encode(w, np.asarray(s_param), 8, axis=-1)
            base = key
            out[base + ".codes"] = pack_codes(codes, 8)
            meta["entries"][base] = {
                "kind": "lsq", "bits": 8, "shape": list(w.shape),
                "enc_shape": list(w.shape), "scale_shape": list(sb.shape)}
            out[base + ".scale"] = sb
            continue
        else:
            out[key] = w
            continue
        out[key + ".codes"] = pack_codes(codes, weight_bits)
        out[key + ".scale"] = s
        meta["entries"][key] = {
            "kind": "statsq", "bits": weight_bits, "shape": list(w.shape),
            "enc_shape": list(w.shape)}
    out["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    return out


def _in_quantized_module(names, path) -> bool:
    """A QLinear kernel always has sibling quantizer params (input_quant/s
    or move_b4/bias) in its module — float Dense kernels don't."""
    mod = path[:-1]
    return any(p[:len(mod)] == mod and "input_quant" in p for p in names)


def _is_lsq_sibling(names, path) -> bool:
    """True when the kernel's module carries a weight_quant scale (LSQ
    weight layers: head, full-LSQ linears)."""
    return _lsq_weight_scale(names, path) is not None


def _lsq_weight_scale(names, path):
    key = path[:-1] + ("weight_quant", "s")
    return names.get(key)


def restore_packed(exported: dict, *, int_core: bool = False) -> dict:
    """Invert export_packed: returns a nested param tree with dequantized
    kernels and `w_qk_frozen` entries, ready for a
    `QuantPolicy(weight_frozen=True)` model.

    int_core=True additionally writes the artifact's ORIGINAL StatsQ
    scales as sibling params (kernel_scale / v_kernel_scale / w_qk_scale)
    for a `QuantPolicy(weight_frozen=True, frozen_int_bits=b)` model:
    serving then reconstructs the integer codes exactly and runs the
    matmuls on the int8 MXU path (serve --int-core)."""
    meta = json.loads(bytes(exported["__meta__"]).decode())
    tree: dict = {}
    done = set()
    for key, info in meta["entries"].items():
        bits = info["bits"]
        enc_shape = info["enc_shape"]
        size = int(np.prod(enc_shape))
        codes = unpack_codes(np.asarray(exported[key + ".codes"]), bits,
                             size).reshape(enc_shape)
        s = np.asarray(exported[key + ".scale"])
        if info["kind"] == "statsq":
            # scale axis: broadcast shape saved as-is
            w = _statsq_decode(codes, s, bits).reshape(info["shape"])
            if int_core:
                path = tuple(key.split("/"))
                if path[-1] == "w_qk_frozen":
                    _set(tree, path[:-1] + ("w_qk_scale",),
                         np.asarray(s, np.float32))
                else:
                    _set(tree, path[:-1] + (path[-1] + "_scale",),
                         np.asarray(s, np.float32))
        else:
            w = _lsq_decode(codes, s, bits,
                            all_positive=info.get("all_positive", False)
                            ).reshape(info["shape"])
        _set(tree, tuple(key.split("/")), np.asarray(w, np.float32))
        done.add(key + ".codes")
        done.add(key + ".scale")
    for key, v in exported.items():
        if key in done or key == "__meta__" or key.endswith((".codes",
                                                             ".scale")):
            continue
        _set(tree, tuple(key.split("/")), np.asarray(v))
    return tree


def artifact_nbytes(exported: dict) -> int:
    return sum(np.asarray(v).nbytes for v in exported.values())
