"""View-feature stores: HDF5 / base64-TSV readers with an in-RAM cache, plus
the deterministic hash store used when no dataset is mounted.

Equivalent of the reference's ImageFeaturesDB (reference:
map_nav_src/utils/data.py:28-77).  The TPU-first difference: features are
read once at world build and baked into the device feature table
(env/world.py) — per-step reads never touch the host.
"""

from __future__ import annotations

import base64
import csv
import sys

import numpy as np


class ImageFeatureStore:
    """HDF5 (key "{scan}_{vp}" -> (36, D)) or TSV-backed store."""

    def __init__(self, path: str, image_feat_size: int, file_type: str = "hdf5"):
        self.path = path
        self.dim = image_feat_size
        self.file_type = file_type
        self._cache = {}
        self._tsv_loaded = False

    def get(self, scan: str, viewpoint: str) -> np.ndarray:
        key = f"{scan}_{viewpoint}"
        if key in self._cache:
            return self._cache[key]
        if self.file_type == "hdf5":
            import h5py

            with h5py.File(self.path, "r") as f:
                ft = f[key][...][:, : self.dim].astype(np.float32)
            self._cache[key] = ft
            return ft
        if self.file_type == "lmdb":
            ft = self._lmdb_get(key)
            self._cache[key] = ft
            return ft
        self._load_tsv()
        return self._cache[key]

    def _lmdb_get(self, key: str) -> np.ndarray:
        """LMDB-backed read (the reference's third reader family,
        pretrain_src/data/dataset.py:818-884: msgpack-encoded arrays keyed by
        scan_vp).  Gated on the ``lmdb`` package being importable."""
        try:
            import lmdb
        except ImportError as e:
            raise ImportError(
                "file_type='lmdb' needs the lmdb package; re-export the "
                "features to HDF5/TSV or install lmdb") from e
        import msgpack

        if not hasattr(self, "_lmdb_env"):
            self._lmdb_env = lmdb.open(self.path, readonly=True, lock=False)
        with self._lmdb_env.begin() as txn:
            raw = txn.get(key.encode("ascii"))
            if raw is None:
                raise KeyError(key)
            blob = msgpack.unpackb(raw, raw=False)
            arr = np.frombuffer(
                blob["data"], dtype=np.dtype(blob["dtype"])).reshape(
                blob["shape"])
        return np.asarray(arr[:, : self.dim], np.float32)

    def _load_tsv(self):
        if self._tsv_loaded:
            return
        csv.field_size_limit(sys.maxsize)
        fields = ["scanId", "viewpointId", "image_w", "image_h", "vfov",
                  "features"]
        with open(self.path) as f:
            for row in csv.DictReader(f, delimiter="\t", fieldnames=fields):
                ft = np.frombuffer(
                    base64.b64decode(row["features"]), dtype=np.float32
                ).reshape(36, -1)[:, : self.dim]
                self._cache[f"{row['scanId']}_{row['viewpointId']}"] = ft
        self._tsv_loaded = True

    def feature_fn(self):
        """Bulk reader for World construction."""
        def fn(scan, node_ids):
            return np.stack([self.get(scan, vp) for vp in node_ids])
        return fn


class HashFeatureStore:
    """Deterministic pseudo-features for dataset-free runs (the framework's
    synthetic fallback; the reference has no equivalent — SURVEY §4)."""

    def __init__(self, image_feat_size: int, seed: int = 0):
        self.dim = image_feat_size
        self.seed = seed

    def get(self, scan: str, viewpoint: str) -> np.ndarray:
        import zlib

        h = zlib.crc32(f"{scan}|{viewpoint}|{self.seed}".encode()) & 0x7FFFFFFF
        r = np.random.default_rng(h)
        return r.standard_normal((36, self.dim)).astype(np.float32) * 0.5

    def feature_fn(self):
        def fn(scan, node_ids):
            return np.stack([self.get(scan, vp) for vp in node_ids])
        return fn


def write_tsv_features(path: str, feats: dict[str, np.ndarray]):
    """Writer for the reference TSV layout (test fixtures + CFP exports)."""
    fields = ["scanId", "viewpointId", "image_w", "image_h", "vfov", "features"]
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, delimiter="\t", fieldnames=fields)
        for key, ft in feats.items():
            scan, vp = key.split("_", 1)
            w.writerow({
                "scanId": scan, "viewpointId": vp, "image_w": 640,
                "image_h": 480, "vfov": 60,
                "features": base64.b64encode(
                    np.ascontiguousarray(ft, dtype=np.float32).tobytes()
                ).decode("ascii"),
            })
