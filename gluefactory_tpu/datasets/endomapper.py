"""Endomapper dataset: cached-feature pairs from COLMAP npz maps
(reference `gluefactory/datasets/endomapper.py:37-579`).

Endoscopic SLAM maps: per-map npz files (schema in
`endomapper_utils.colmap_map_to_npz`) with KB4 fisheye cameras, sparse
keypoint depths + 3D point ids, and an overlap matrix for pair sampling.
Samples carry cached features only (no images on the hot path), so the
device pipeline runs matcher+GT directly — the fork's CudaSift-cache
training mode.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .. import logger
from ..geometry.wrappers import Camera, Pose
from ..models.utils.misc import pad_features_np
from ..settings import DATA_PATH
from .base_dataset import BaseDataset

__main_class__ = "Endomapper"


class _EndomapperPairs:
    def __init__(self, conf, maps: dict, split: str):
        self.conf = conf
        self.maps = maps
        self.split = split
        self.items = []
        self.sample_new_items(conf.get("seed", 0))

    def sample_new_items(self, seed: int):
        conf = self.conf
        rng = np.random.RandomState(seed)
        items = []
        for name, m in self.maps.items():
            ov = m["overlap_matrix"]
            ok = (ov >= conf.min_overlap) & (ov <= conf.max_overlap)
            i_idx, j_idx = np.where(np.triu(ok, k=1))
            if len(i_idx) == 0:
                continue
            num = min(conf.num_per_map, len(i_idx))
            if conf.num_overlap_bins > 1:
                vals = ov[i_idx, j_idx]
                bins = np.linspace(
                    conf.min_overlap, conf.max_overlap, conf.num_overlap_bins + 1
                )
                which = np.digitize(vals, bins[1:-1])
                sel = []
                per_bin = max(1, num // conf.num_overlap_bins)
                for b in range(conf.num_overlap_bins):
                    cand = np.where(which == b)[0]
                    if len(cand):
                        sel.append(rng.choice(cand, min(per_bin, len(cand)), False))
                sel = np.concatenate(sel) if sel else np.array([], int)
            else:
                sel = rng.choice(len(i_idx), num, replace=False)
            items += [(name, int(i_idx[k]), int(j_idx[k])) for k in sel]
        rng.shuffle(items)
        self.items = items
        logger.info(f"endomapper[{self.split}]: {len(items)} pairs")

    def __len__(self):
        return len(self.items)

    def _read_view(self, m, idx):
        """Build a cached-feature view (reference `endomapper.py:286-360`)."""
        conf = self.conf
        k = int(conf.max_num_keypoints)
        kpts = np.asarray(m["keypoints"][idx], np.float32).reshape(-1, 2)
        scores = np.asarray(m["scores"][idx], np.float32).reshape(-1)
        desc = (
            np.asarray(m["descriptors"][idx], np.float32)
            if "descriptors" in m and m["descriptors"] is not None
            else np.zeros((len(kpts), conf.descriptor_dim), np.float32)
        )
        depths = np.asarray(m["kp_depths"][idx], np.float32).reshape(-1)
        p3d = np.asarray(m["kp_p3d_ids"][idx], np.int64).reshape(-1)

        out_k, out_s, out_d, valid = pad_features_np(kpts, scores, desc, k)
        # pad depths/ids with the same ordering as pad_features_np (score order)
        order = np.argsort(-scores)[: min(len(kpts), k)]
        out_depth = np.zeros(k, np.float32)
        out_p3d = np.full(k, -1, np.int64)
        out_depth[: len(order)] = depths[order]
        out_p3d[: len(order)] = p3d[order]

        cam = Camera(
            size=m["camera_size"],
            f=m["camera_f"],
            c=m["camera_c"],
            dist=m["camera_dist"][:4],
            model="kb4" if str(m.get("camera_model", "OPENCV_FISHEYE")).upper().startswith("OPENCV_FISH") else "pinhole",
        )
        return {
            "cache": {
                "keypoints": out_k,
                "keypoint_scores": out_s,
                "descriptors": out_d,
                "keypoint_valid": valid,
                "keypoint_depths": out_depth,
                "keypoint_p3d_ids": out_p3d,
            },
            "camera": cam,
            "image_size": np.asarray(m["camera_size"], np.float32),
            "T_w2cam": Pose.from_4x4mat(m["poses"][idx]),
            "name": str(m["image_names"][idx]),
        }

    def __getitem__(self, i):
        map_name, i0, i1 = self.items[i]
        m = self.maps[map_name]
        v0 = self._read_view(m, i0)
        v1 = self._read_view(m, i1)
        T0 = v0.pop("T_w2cam")
        T1 = v1.pop("T_w2cam")
        T_0to1 = (T1 @ T0.inv()).float()
        return {
            "view0": v0,
            "view1": v1,
            "T_0to1": T_0to1,
            "T_1to0": T_0to1.inv().float(),
            "idx": i,
            "name": f"{map_name}/{v0['name']}_{v1['name']}",
            "overlap_0to1": float(m["overlap_matrix"][i0, i1]),
        }


class Endomapper(BaseDataset):
    default_conf = {
        "data_dir": "endomapper/maps",
        "train_maps": None,  # list of npz stems; None = all
        "val_maps": None,
        "test_maps": None,
        "min_overlap": 0.3,
        "max_overlap": 1.0,
        "num_overlap_bins": 3,
        "num_per_map": 300,
        "min_images_per_map": 5,
        "max_num_keypoints": 1024,
        "descriptor_dim": 128,
    }

    def _init(self, conf):
        root = DATA_PATH / conf.data_dir
        if not root.exists():
            raise FileNotFoundError(f"Endomapper maps not found at {root}")
        self.all_maps = {}
        for p in sorted(root.glob("*.npz")):
            try:
                m = dict(np.load(p, allow_pickle=True))
            except Exception as e:  # corrupted-map forensics (reference `:292-318`)
                logger.error(f"corrupted map {p}: {e}")
                continue
            if len(m["image_names"]) < conf.min_images_per_map:
                continue
            self.all_maps[p.stem] = m
        self._splits = {}

    def _maps_for(self, split):
        names = self.conf.get(f"{split}_maps")
        if names is None:
            return self.all_maps
        return {n: self.all_maps[n] for n in names if n in self.all_maps}

    def get_dataset(self, split):
        if split not in self._splits:
            self._splits[split] = _EndomapperPairs(
                self.conf, self._maps_for(split), split
            )
        return self._splits[split]

    def sample_new_items(self, seed: int):
        for ds in self._splits.values():
            if ds.split == "train":
                ds.sample_new_items(seed)
