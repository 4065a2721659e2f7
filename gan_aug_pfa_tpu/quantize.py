"""[extension] Post-training weight-only int8 quantization for serving.

The reference has no quantization or deployment story (SURVEY.md §5 — its
inference scripts reload full-precision ``.pth`` files per run, reference
generate_synthetic_data.py:44-48, evaluate.py:343-351).  For production TPU
serving the rebuild adds the standard first rung of the quantization
ladder: **symmetric per-output-channel int8 weights, full-precision
activations** — the scheme that needs no calibration data and no
quantization-aware training.

What it buys on TPU:

  * 4x smaller serving artifacts (the 41.8M-param generator's weights drop
    from 167 MB fp32 to ~42 MB) — faster cold starts and cheaper
    distribution;
  * a 4x smaller HBM weight footprint at serve time: the int8 tensors are
    runtime *arguments* to the exported program (not baked constants), so
    XLA cannot constant-fold the dequantize back into fp32 — HBM holds
    int8 + one fp32 scale per output channel, and the cast happens on the
    fly inside the fused conv epilogues where possible;
  * bounded, testable error: per-channel symmetric rounding guarantees
    |w - dequant(q)| <= scale/2 elementwise (tests/test_quantize.py).

Representation: a quantized leaf is the dict ``{"q8": int8[*shape],
"q8_scale": f32[out_channels]}`` spliced into the variables pytree where
the fp tensor was.  Only tensors with ndim >= 2 and >= ``min_elems``
elements are quantized (conv / conv-transpose kernels, HWIO — the last dim
is output channels in both flax layouts); BatchNorm vectors, biases and
running stats stay full precision, which is what preserves accuracy on
BN-heavy nets like these.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

QKEY = "q8"
SKEY = "q8_scale"

#: Leaves smaller than this stay fp — quantizing tiny tensors saves no
#: meaningful bytes and BN statistics / biases are accuracy-critical.
DEFAULT_MIN_ELEMS = 4096


def is_qleaf(node: Any) -> bool:
    """True for the dict node a quantized tensor is stored as."""
    return isinstance(node, dict) and QKEY in node and SKEY in node


def quantize_array(w: np.ndarray) -> Dict[str, np.ndarray]:
    """Symmetric per-output-channel int8 quantization of one tensor.

    The last axis is treated as output channels (flax Conv/ConvTranspose
    kernels are HWIO / HWIO').  scale[c] = max|w[..., c]| / 127, so the
    reconstruction error is bounded by scale/2 per element."""
    w = np.asarray(w, dtype=np.float32)
    reduce_axes = tuple(range(w.ndim - 1))
    amax = np.max(np.abs(w), axis=reduce_axes)
    scale = amax / 127.0
    scale = np.where(scale == 0.0, 1.0, scale).astype(np.float32)
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return {QKEY: q, SKEY: scale}


def dequantize_array(node: Dict[str, Any], dtype=np.float32):
    """Inverse of quantize_array (up to the rounding error bound).

    Works on numpy or jax arrays — inside a jitted serving fn the inputs
    are tracers and this lowers to a fused convert + broadcast-multiply
    (+ final cast) elementwise chain.  The multiply always runs in fp32 —
    int8 values and the fp32 scales are exact there — and only the RESULT
    is cast to ``dtype``, so a bfloat16 dequantize rounds once instead of
    also rounding the scales (which would double the error)."""
    q = node[QKEY]
    s = node[SKEY]
    out = q.astype(np.float32) * s
    if np.dtype(dtype) != np.dtype(np.float32):
        out = out.astype(dtype)
    return out


def quantize_tree(
    tree: Any, min_elems: int = DEFAULT_MIN_ELEMS
) -> Tuple[Any, Dict[str, int]]:
    """Quantize every large >=2-D leaf of a variables pytree.

    Returns (qtree, report).  qtree mirrors the input structure with
    quantized leaves replaced by ``{"q8": ..., "q8_scale": ...}`` dict
    nodes; report counts tensors and bytes either side."""
    report = {"quantized": 0, "kept_fp": 0, "bytes_fp": 0, "bytes_q": 0}

    def walk(node):
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        arr = np.asarray(node)
        nbytes_fp = int(arr.size) * 4  # fp32 reference footprint
        if arr.ndim >= 2 and arr.size >= min_elems:
            qnode = quantize_array(arr)
            report["quantized"] += 1
            report["bytes_fp"] += nbytes_fp
            report["bytes_q"] += (
                qnode[QKEY].nbytes + qnode[SKEY].nbytes
            )
            return qnode
        report["kept_fp"] += 1
        report["bytes_fp"] += nbytes_fp
        report["bytes_q"] += nbytes_fp
        return node

    return walk(tree), report


def dequantize_tree(qtree: Any, dtype=np.float32) -> Any:
    """Rebuild a full-precision variables pytree from a quantized one.

    Usable both on host numpy trees (tests, converters) and inside a
    jitted serving function over tracer leaves (serve.py)."""

    def walk(node):
        if is_qleaf(node):
            return dequantize_array(node, dtype)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(qtree)


def max_reconstruction_error(tree: Any, qtree: Any) -> float:
    """Largest |w - dequant(q)| / scale over all quantized leaves — by
    construction must be <= 0.5 (+ float rounding); exposed for tests."""
    worst = 0.0

    def walk(a, b):
        nonlocal worst
        if is_qleaf(b):
            w = np.asarray(a, np.float32)
            err = np.abs(w - np.asarray(dequantize_array(b)))
            worst = max(worst, float(np.max(err / b[SKEY])))
        elif isinstance(b, dict):
            for k in b:
                walk(a[k], b[k])

    walk(tree, qtree)
    return worst
