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
    tree of {'q': int8, 'scale': f32} dicts in place of quantized leaves.
    The original dtype rides along as a zero-size proxy array (survives
    msgpack round-trips, unlike a string) so dequantization restores the
    exact dtype — an AOT-exported program's param avals must match
    (serving.NavServer.export_bundle lowers against the live dtypes)."""

    def visit(leaf):
        arr = np.asarray(leaf)
        # jnp.issubdtype covers the ml_dtypes extension floats (bfloat16)
        # that np.issubdtype rejects — a bf16 kernel must quantize too, not
        # silently ship raw
        if arr.ndim >= 2 and arr.size >= min_size and \
                jnp.issubdtype(arr.dtype, jnp.floating):
            q, scale = quantize_array(arr)
            return {"__int8__": q, "scale": scale,
                    "dtype": np.zeros((0,), arr.dtype)}
        return arr

    return jax.tree_util.tree_map(visit, params)


def dequantize_params(qparams):
    def is_qleaf(x):
        return isinstance(x, dict) and "__int8__" in x

    def visit(x):
        if is_qleaf(x):
            deq = dequantize_array(x["__int8__"], x["scale"])
            if "dtype" in x:
                deq = deq.astype(np.asarray(x["dtype"]).dtype)
            return jnp.asarray(deq)
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
                return {k: node[k] for k in ("__int8__", "scale", "dtype")
                        if k in node}
            return {k: rebuild(v) for k, v in node.items()}
        return node

    return dequantize_params(rebuild(nested))


# ----- product quantization (fairseq modules/quantization/pq, the EM
#       codebook learner: split each row into M subvectors, k-means each
#       block, store uint8 codes + centroid tables) -----

class ProductQuantizer:
    """PQ for 2-D weight matrices: columns split into ``num_blocks`` groups,
    each group's subvectors clustered into ``num_centroids`` codewords.

    Compression: [R, C] f32 -> [R, M] uint8 codes + [M, K, C/M] centroids.
    """

    def __init__(self, num_blocks: int = 4, num_centroids: int = 256,
                 iters: int = 12, seed: int = 0):
        assert num_centroids <= 256, "codes are uint8"
        self.M = num_blocks
        self.K = num_centroids
        self.iters = iters
        self.seed = seed
        self.centroids = None   # [M, K, sub]

    def fit(self, w: np.ndarray) -> "ProductQuantizer":
        w = np.asarray(w, np.float32)
        r, c = w.shape
        assert c % self.M == 0, f"{c} columns not divisible by {self.M} blocks"
        sub = c // self.M
        rng = np.random.default_rng(self.seed)
        cents = []
        for m in range(self.M):
            x = w[:, m * sub : (m + 1) * sub]
            k = min(self.K, len(x))
            cent = x[rng.choice(len(x), k, replace=False)].copy()
            for _ in range(self.iters):   # lloyd iterations
                d = ((x[:, None, :] - cent[None]) ** 2).sum(-1)
                assign = d.argmin(1)
                for j in range(k):
                    sel = assign == j
                    if sel.any():
                        cent[j] = x[sel].mean(0)
            if k < self.K:                # pad the codebook
                cent = np.concatenate(
                    [cent, np.repeat(cent[-1:], self.K - k, axis=0)])
            cents.append(cent)
        self.centroids = np.stack(cents)
        return self

    def encode(self, w: np.ndarray) -> np.ndarray:
        w = np.asarray(w, np.float32)
        sub = w.shape[1] // self.M
        codes = np.empty((w.shape[0], self.M), np.uint8)
        for m in range(self.M):
            x = w[:, m * sub : (m + 1) * sub]
            d = ((x[:, None, :] - self.centroids[m][None]) ** 2).sum(-1)
            codes[:, m] = d.argmin(1).astype(np.uint8)
        return codes

    def decode(self, codes: np.ndarray) -> np.ndarray:
        return np.concatenate(
            [self.centroids[m][codes[:, m]] for m in range(self.M)], axis=1)

    def state(self) -> dict:
        return {"centroids": self.centroids, "num_blocks": self.M,
                "num_centroids": self.K}

    @classmethod
    def from_state(cls, state: dict) -> "ProductQuantizer":
        pq = cls(int(state["num_blocks"]), int(state["num_centroids"]))
        pq.centroids = np.asarray(state["centroids"], np.float32)
        return pq
