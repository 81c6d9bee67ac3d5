"""MegaDepth dataset (reference `gluefactory/datasets/megadepth.py:36-515`).

SfM-posed image pairs with dense depth: per-scene info npz files
({image_paths, depth_paths, intrinsics, poses, overlap_matrix}), per-epoch
**overlap-binned pair sampling** re-triggered by the trainer's dataset
callback (`sample_new_items`, reference `megadepth.py:160-240`,
`train.py:1061-1073`), image + h5-depth loading with resize/crop bookkeeping,
optional ±90° rotation augmentation, and cached-feature loading.

Outputs fixed-shape: images resized to `preprocessing.resize` with square
padding; depth maps resized alongside.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import h5py
import numpy as np

from .. import logger
from ..geometry.wrappers import Camera, Pose
from ..models.cache_loader import CacheLoader, pad_local_features
from ..settings import DATA_PATH
from ..utils.image import ImagePreprocessor, read_image
from .base_dataset import BaseDataset

__main_class__ = "MegaDepth"


def scale_intrinsics(K: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """Adapt a 3x3 K to per-axis image scaling (reference `datasets/utils.py:65`)."""
    T = np.diag([scales[0], scales[1], 1.0]).astype(K.dtype)
    return T @ K


class _MegaDepthSplit:
    def __init__(self, conf, root, split: str):
        self.conf = conf
        self.root = Path(root)
        self.split = split
        self.preproc = ImagePreprocessor(conf.preprocessing)
        self.cache_loader = (
            CacheLoader(conf.load_features) if conf.load_features["do"] else None
        )
        info_dir = self.root / conf.info_dir
        scenes = conf.get(f"{split}_scenes") or conf.scenes
        if scenes is None:
            scenes = sorted(p.stem for p in info_dir.glob("*.npz"))
        self.scenes = list(scenes)
        self.info = {}
        for s in self.scenes:
            path = info_dir / f"{s}.npz"
            if not path.exists():
                logger.warning(f"scene info missing: {path}")
                continue
            self.info[s] = dict(np.load(path, allow_pickle=True))
        self.items = []
        self.sample_new_items(conf.get("seed", 0))

    # -- pair sampling (reference `megadepth.py:160-240`) -------------------
    def sample_new_items(self, seed: int):
        conf = self.conf
        num = conf.get(f"{self.split}_num_per_scene") or conf.num_per_scene
        rng = np.random.RandomState(seed)
        items = []
        for s, info in self.info.items():
            overlap = np.asarray(info["overlap_matrix"], np.float32)
            valid = np.asarray(
                [p is not None for p in info["image_paths"]], bool
            )
            ok = (
                (overlap >= conf.min_overlap)
                & (overlap <= conf.max_overlap)
                & valid[:, None]
                & valid[None, :]
            )
            idx_i, idx_j = np.where(np.triu(ok, k=1))
            if len(idx_i) == 0:
                continue
            if conf.num_overlap_bins > 1:
                # bin by overlap so hard/easy pairs are balanced
                ov = overlap[idx_i, idx_j]
                bins = np.linspace(
                    conf.min_overlap, conf.max_overlap, conf.num_overlap_bins + 1
                )
                which = np.digitize(ov, bins[1:-1])
                chosen = []
                per_bin = max(1, num // conf.num_overlap_bins)
                for b in range(conf.num_overlap_bins):
                    cand = np.where(which == b)[0]
                    if len(cand):
                        chosen.append(
                            rng.choice(cand, min(per_bin, len(cand)), replace=False)
                        )
                sel = np.concatenate(chosen) if chosen else np.array([], int)
            else:
                sel = rng.choice(
                    len(idx_i), min(num, len(idx_i)), replace=False
                )
            items += [(s, int(idx_i[k]), int(idx_j[k])) for k in sel]
        rng.shuffle(items)
        self.items = items
        logger.info(f"megadepth[{self.split}]: sampled {len(items)} pairs")

    def __len__(self):
        return len(self.items)

    # -- view loading (reference `megadepth.py:251-344`) --------------------
    def _read_view(self, info, idx, rotation=0):
        img_path = self.root / str(info["image_paths"][idx])
        img = read_image(img_path, self.conf.grayscale)
        K = np.asarray(info["intrinsics"][idx], np.float32).copy()
        T_w2cam = np.asarray(info["poses"][idx], np.float32)

        depth = None
        if self.conf.read_depth:
            depth_path = self.root / str(info["depth_paths"][idx])
            with h5py.File(str(depth_path), "r") as f:
                depth = f["/depth"].__array__().astype(np.float32)

        if rotation:  # k*90° CCW
            img = np.rot90(img, k=rotation).copy()
            if depth is not None:
                depth = np.rot90(depth, k=rotation).copy()
            from .utils import rotate_intrinsics, rotate_pose_inplane

            for _ in range(rotation):
                K = rotate_intrinsics(K, img.shape[:2][::-1])
                T_w2cam = rotate_pose_inplane(T_w2cam)

        out = self.preproc(img)
        K = scale_intrinsics(K, out["scales"])
        if depth is not None:
            w, h = int(out["image_size"][0]), int(out["image_size"][1])
            depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_NEAREST)
            if self.conf.preprocessing["square_pad"]:
                s = max(out["image"].shape[0], out["image"].shape[1])
                padded = np.zeros((s, s), np.float32)
                padded[: depth.shape[0], : depth.shape[1]] = depth
                depth = padded
            out["depth"] = depth
        cam = Camera.from_calibration_matrix(K, size=out["image_size"])
        out["camera"] = cam
        out["T_w2cam"] = Pose.from_4x4mat(T_w2cam)
        out["name"] = Path(str(info["image_paths"][idx])).name
        if self.cache_loader is not None:
            feats = self.cache_loader(
                {"name": out["name"], "scales": out["scales"]}
            )
            feats = pad_local_features(feats, int(self.conf.load_features["max_num_keypoints"]))
            out["cache"] = feats
        return out

    def __getitem__(self, i):
        conf = self.conf
        scene, i0, i1 = self.items[i]
        info = self.info[scene]
        rot = 0
        if conf.p_rotate > 0 and self.split == "train":
            if np.random.rand() < conf.p_rotate:
                rot = np.random.choice([1, 3])
        v0 = self._read_view(info, i0, rotation=rot)
        v1 = self._read_view(info, i1, rotation=rot if conf.rotate_both else 0)
        T0 = v0.pop("T_w2cam")
        T1 = v1.pop("T_w2cam")
        T_0to1 = T1 @ T0.inv()
        name = f"{scene}/{v0['name']}_{v1['name']}"
        return {
            "view0": v0,
            "view1": v1,
            "T_0to1": T_0to1.float(),
            "T_1to0": T_0to1.inv().float(),
            "idx": i,
            "name": name,
            "scene": scene,
            "overlap_0to1": float(
                np.asarray(info["overlap_matrix"])[i0, i1]
            ),
        }


class _MegaDepthTriplets(_MegaDepthSplit):
    """Triplet sampling (reference `_TripletDataset:371`): per pair (i, j),
    add a third view k maximizing min(overlap(i,k), overlap(j,k))."""

    def sample_new_items(self, seed):
        super().sample_new_items(seed)
        triplets = []
        for scene, i0, i1 in self.items:
            ov = np.asarray(self.info[scene]["overlap_matrix"], np.float32)
            cand = np.minimum(ov[i0], ov[i1])
            cand[[i0, i1]] = -1
            k = int(np.argmax(cand))
            if cand[k] >= self.conf.min_overlap:
                triplets.append((scene, i0, i1, k))
        self.items = triplets

    def __getitem__(self, idx):
        scene, i0, i1, i2 = self.items[idx]
        info = self.info[scene]
        views = [self._read_view(info, i) for i in (i0, i1, i2)]
        Ts = [v.pop("T_w2cam") for v in views]
        data = {
            "view0": views[0],
            "view1": views[1],
            "view2": views[2],
            "idx": idx,
            "name": f"{scene}/{views[0]['name']}_{views[1]['name']}_{views[2]['name']}",
            "scene": scene,
        }
        for (a, b) in ((0, 1), (0, 2), (1, 2)):
            T = (Ts[b] @ Ts[a].inv()).float()
            data[f"T_{a}to{b}"] = T
        return data


class MegaDepth(BaseDataset):
    default_conf = {
        "data_dir": "megadepth",
        "info_dir": "scene_info",
        "scenes": None,
        "train_scenes": None,
        "val_scenes": None,
        "test_scenes": None,
        "min_overlap": 0.3,
        "max_overlap": 1.0,
        "num_overlap_bins": 3,
        "num_per_scene": 500,
        "train_num_per_scene": None,
        "val_num_per_scene": None,
        "test_num_per_scene": None,
        "grayscale": False,
        "read_depth": True,
        "p_rotate": 0.0,
        "rotate_both": False,
        "views": 2,  # 3 -> triplet sampling (reference `_TripletDataset:371`)
        "preprocessing": {"resize": 1024, "side": "long", "square_pad": True},
        "load_features": {
            "do": False,
            "path": "exports/megadepth/{scene}.h5",
            "data_keys": ["keypoints", "keypoint_scores", "descriptors"],
            "max_num_keypoints": 2048,
        },
    }

    def _init(self, conf):
        self.root = DATA_PATH / conf.data_dir
        if not self.root.exists():
            raise FileNotFoundError(f"MegaDepth not found at {self.root}")
        self._splits = {}

    def get_dataset(self, split):
        if split not in self._splits:
            cls = (
                _MegaDepthTriplets if self.conf.get("views", 2) == 3 else _MegaDepthSplit
            )
            self._splits[split] = cls(self.conf, self.root, split)
        return self._splits[split]

    def sample_new_items(self, seed: int):
        """Trainer dataset-callback hook (reference `train.py:1061-1073`)."""
        for ds in self._splits.values():
            if ds.split == "train":
                ds.sample_new_items(seed)
