"""CacheLoader: a "model" that reads cached features/predictions from HDF5
(reference `gluefactory/models/cache_loader.py:63-174`).

Host-side (h5py in loader threads) — it is used in dataset __getitem__ and in
eval Loop 2 where no device compute is involved. Rescales keypoints/lines by
the view scales like the reference (`:152-161`), and pads to fixed K.
"""

from __future__ import annotations

from pathlib import Path

import h5py
import numpy as np

from ..core.config import Config
from ..settings import DATA_PATH


def pad_local_features(pred: dict, k: int) -> dict:
    """Pad keypoints/scores/descriptors(/lines) to exactly k with validity
    (reference `cache_loader.py:17-60`)."""
    n = len(pred["keypoints"])
    out = dict(pred)
    valid = np.zeros(k, bool)
    valid[: min(n, k)] = True
    out["keypoint_valid"] = valid

    def pad(a, fill=0.0):
        a = np.asarray(a)
        if len(a) >= k:
            return a[:k]
        pad_shape = (k - len(a),) + a.shape[1:]
        return np.concatenate([a, np.full(pad_shape, fill, a.dtype)])

    out["keypoints"] = pad(pred["keypoints"]).astype(np.float32)
    if "keypoint_scores" in pred:
        out["keypoint_scores"] = pad(pred["keypoint_scores"]).astype(np.float32)
    if "descriptors" in pred:
        out["descriptors"] = pad(pred["descriptors"]).astype(np.float32)
    for extra in ("scales", "oris", "depth_keypoints", "valid_depth_keypoints"):
        if extra in pred:
            out[extra] = pad(pred[extra]).astype(np.float32)
    return out


class CacheLoader:
    """Not an nn.Module: pure host IO, usable inside dataset __getitem__."""

    default_conf = {
        "path": "???",  # can contain {scene}
        "data_keys": ["keypoints", "keypoint_scores", "descriptors"],
        "device_keys": [],
        "trainable": False,
        "add_data_path": True,
        "collate": True,
        "scale": ["keypoints", "lines", "orig_lines"],
        "padding_length": None,
        "padding_fn": None,
        "numeric_type": "float32",
    }

    def __init__(self, conf=None):
        self.conf = Config.merge(Config(self.default_conf), conf or {})

    def __call__(self, data: dict) -> dict:
        """data: {"name": str, optional "scene", "scales", "idx"}."""
        conf = self.conf
        path = conf.path.format(**{k: data.get(k) for k in ("scene", "idx")})
        if conf.add_data_path:
            path = DATA_PATH / path
        pred = {}
        with h5py.File(str(path), "r") as hfile:
            grp = hfile[str(data["name"])]
            for k in conf.data_keys:
                if k in grp:
                    v = grp[k].__array__()
                    pred[k] = v.astype(conf.numeric_type) if v.dtype.kind == "f" else v
        # de-batch cached entries saved with a leading 1-dim
        pred = {
            k: (v[0] if v.ndim > 0 and v.shape[0] == 1 and k != "keypoints" and v.ndim > 2 else v)
            for k, v in pred.items()
        }
        if "scales" in data:
            s = np.asarray(data["scales"], np.float32)
            for k in conf.scale:
                if k in pred:
                    pred[k] = (pred[k] + 0.5) * s - 0.5
        if conf.padding_length:
            pred = pad_local_features(pred, int(conf.padding_length))
        return pred
