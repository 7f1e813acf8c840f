"""Post-training int8 weight quantization for serving.

TPU-native counterpart of the fairseq fork's quantization toolkit
(reference: map_nav_src/fairseq/modules/quantization/ — product quantization
and scalar fake-quant, ~1,400 LoC): per-channel symmetric int8 for matmul
kernels, fp32 for everything else.  Halves (vs bf16) / quarters (vs f32)
checkpoint and HBM footprint for deployment; dequantization is a cheap
elementwise multiply XLA fuses into the consumer matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quantize_array(x: np.ndarray, axis: int = -1):
    """Per-channel symmetric int8: returns (q int8, scale f32)."""
    x = np.asarray(x, np.float32)
    amax = np.max(np.abs(x), axis=axis, keepdims=True)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(x / scale), -127, 127).astype(np.int8)
    return q, scale


def dequantize_array(q: np.ndarray, scale: np.ndarray) -> np.ndarray:
    return q.astype(np.float32) * scale


def quantize_params(params, min_size: int = 1024):
    """Quantize every >=2-D kernel with >= min_size elements.  Returns a
    tree of {'q': int8, 'scale': f32} dicts in place of quantized leaves."""

    def visit(leaf):
        arr = np.asarray(leaf)
        if arr.ndim >= 2 and arr.size >= min_size and \
                np.issubdtype(arr.dtype, np.floating):
            q, scale = quantize_array(arr)
            return {"__int8__": q, "scale": scale}
        return arr

    return jax.tree_util.tree_map(visit, params)


def dequantize_params(qparams):
    def is_qleaf(x):
        return isinstance(x, dict) and "__int8__" in x

    def visit(x):
        if is_qleaf(x):
            return jnp.asarray(dequantize_array(x["__int8__"], x["scale"]))
        return x

    return jax.tree_util.tree_map(visit, qparams, is_leaf=is_qleaf)


def quantization_error(params, qparams) -> dict:
    """Per-leaf relative L2 error of the quantized tree (diagnostics)."""
    deq = dequantize_params(qparams)
    flat_p = jax.tree_util.tree_leaves_with_path(params)
    flat_d = jax.tree_util.tree_leaves(deq)
    out = {}
    for (path, p), d in zip(flat_p, flat_d):
        p = np.asarray(p, np.float32)
        d = np.asarray(d, np.float32)
        denom = np.linalg.norm(p) + 1e-9
        name = ".".join(str(getattr(k, "key", getattr(k, "name", k)))
                        for k in path)
        out[name] = float(np.linalg.norm(p - d) / denom)
    return out


def save_quantized(params, path: str):
    """Quantized checkpoint as an npz (int8 kernels + scales)."""
    from .checkpoint import flatten_params

    q = quantize_params(params)
    flat = {}
    for name, leaf in flatten_params(q).items():
        flat[name] = leaf
    np.savez_compressed(path, **flat)


def load_quantized(path: str):
    from .checkpoint import _nest

    blob = np.load(path)
    flat = {k: blob[k] for k in blob.files}
    nested = _nest(flat)

    def rebuild(node):
        if isinstance(node, dict):
            if "__int8__" in node:
                return {"__int8__": node["__int8__"], "scale": node["scale"]}
            return {k: rebuild(v) for k, v in node.items()}
        return node

    return dequantize_params(rebuild(nested))
