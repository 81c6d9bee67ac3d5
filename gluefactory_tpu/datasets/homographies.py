"""Synthetic homography-pair dataset
(reference `gluefactory/datasets/homographies.py:47-851`).

Two views of one image under random homographies + photometric augmentation.
Host-side (numpy/cv2) in loader workers; outputs fixed-shape float NHWC.

Additions vs reference:
  - `synthetic.enable`: procedurally generates a corpus of textured images
    (polygons/checkerboards/gradients) when no photo corpus (revisitop1m) is
    on disk — keeps training/benching runnable in air-gapped TPU pods.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from ..core.config import Config
from ..geometry.homography import sample_homography_corners
from ..settings import DATA_PATH
from .augmentations import augmentations
from .base_dataset import BaseDataset

__main_class__ = "HomographyDataset"


def generate_synthetic_image(rng: np.random.RandomState, w=640, h=480) -> np.ndarray:
    """Procedural textured image: gradient background + random shapes."""
    # smooth gradient background
    gx = np.linspace(0, 1, w, dtype=np.float32)[None, :]
    gy = np.linspace(0, 1, h, dtype=np.float32)[:, None]
    a, b, c = rng.rand(3)
    base = a * gx + b * gy + c * gx * gy
    img = np.stack([base * rng.uniform(0.3, 1.0) for _ in range(3)], -1)
    img = (img - img.min()) / max(np.ptp(img), 1e-6) * 0.6 + 0.2
    img = np.ascontiguousarray((img * 255).astype(np.uint8))
    # random polygons / circles / lines with distinct intensities
    for _ in range(rng.randint(20, 40)):
        color = tuple(int(x) for x in rng.randint(0, 255, 3))
        kind = rng.randint(3)
        if kind == 0:
            n = rng.randint(3, 7)
            pts = rng.randint(0, [w, h], (n, 2)).astype(np.int32)
            cv2.fillPoly(img, [pts], color)
        elif kind == 1:
            cv2.circle(
                img,
                (rng.randint(w), rng.randint(h)),
                rng.randint(5, 60),
                color,
                -1 if rng.rand() < 0.7 else 2,
            )
        else:
            p0 = (rng.randint(w), rng.randint(h))
            p1 = (rng.randint(w), rng.randint(h))
            cv2.line(img, p0, p1, color, rng.randint(1, 5))
    # mild blur to create gradients
    img = cv2.GaussianBlur(img, (5, 5), 1.0)
    return img.astype(np.float32) / 255.0


class _HomographyTorchlessDataset:
    """Map-style split dataset."""

    def __init__(self, conf: Config, image_paths, split: str):
        self.conf = conf
        self.image_paths = image_paths
        self.split = split
        self.photo_aug = augmentations[conf.photometric["name"]](conf.photometric)
        ps = conf.homography["patch_shape"]
        self.patch_shape = (int(ps[0]), int(ps[1]))
        self._feature_file = None

    def _load_cached_features(self, name: str) -> dict | None:
        """Per-image features from an exported HDF5 cache
        (reference `homographies.py:447-458`; produced by
        `scripts/export_local_features.py`)."""
        lf = self.conf.get("load_features")
        if not lf or not lf.get("do", False):
            return None
        if self._feature_file is None:
            import h5py

            path = Path(lf["path"])
            if not path.is_absolute():
                path = DATA_PATH / path
            self._feature_file = h5py.File(str(path), "r")
        f = self._feature_file
        key = name if name in f else Path(name).name
        if key not in f:
            return None
        return {k: v.__array__() for k, v in f[key].items()}

    def _warp_cached_features(self, feats: dict, H: np.ndarray) -> dict:
        """Warp cached base-image keypoints into a sampled view, filter to
        the patch, threshold, top-k, and pad fixed-K
        (reference `homographies.py:460-492`)."""
        from ..geometry.homography import warp_points_np
        from ..models.utils.misc import pad_features_np

        lf = self.conf["load_features"]
        kpts = np.asarray(feats["keypoints"], np.float32).reshape(-1, 2)
        scores = np.asarray(feats["keypoint_scores"], np.float32).reshape(-1)
        desc = np.asarray(feats["descriptors"], np.float32).reshape(len(kpts), -1)
        if "keypoint_valid" in feats:
            keep = np.asarray(feats["keypoint_valid"]).astype(bool).reshape(-1)
            kpts, scores, desc = kpts[keep], scores[keep], desc[keep]

        warped = warp_points_np(kpts, H, inverse=False)
        w, h = self.patch_shape
        inb = (
            (warped[:, 0] >= 0)
            & (warped[:, 0] <= w - 1)
            & (warped[:, 1] >= 0)
            & (warped[:, 1] <= h - 1)
        )
        th = lf.get("thresh", -1)
        if th > 0:
            inb &= scores >= th
        warped, scores, desc = warped[inb], scores[inb], desc[inb]
        k = int(lf.get("max_num_keypoints", -1))
        if k <= 0:
            k = max(len(warped), 1)
        out_k, out_s, out_d, valid = pad_features_np(warped, scores, desc, k)
        return {
            "keypoints": out_k,
            "keypoint_scores": out_s,
            "descriptors": out_d,
            "keypoint_valid": valid,
        }

    def __len__(self):
        return len(self.image_paths)

    def _read(self, idx):
        p = self.image_paths[idx]
        if isinstance(p, np.ndarray):
            return p
        img = cv2.imread(str(p), cv2.IMREAD_COLOR)
        if img is None:
            raise IOError(f"cannot read {p}")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0

    def _sample_view(self, img, rng, difficulty):
        h_conf = self.conf.homography
        H, _, _, _ = sample_homography_corners(
            (img.shape[1], img.shape[0]),
            self.patch_shape,
            difficulty=difficulty,
            translation=h_conf["translation"],
            max_angle=h_conf["max_angle"],
            rng=rng,
        )
        warped = cv2.warpPerspective(img, H, self.patch_shape)
        return warped, H

    def __getitem__(self, idx):
        conf = self.conf
        # deterministic per (split, epoch-independent) item for val/test
        seed = conf.get("seed", 0) + idx
        rng = (
            np.random.RandomState(seed)
            if self.split != "train" or conf.get("reseed", False)
            else np.random.RandomState(np.random.randint(2**31) + idx)
        )
        img = self._read(idx)
        if conf.get("grayscale", False):
            img = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)[..., None]

        difficulty = conf.homography["difficulty"]
        img0, H0 = self._sample_view(img, rng, difficulty)
        img1, H1 = self._sample_view(img, rng, difficulty)
        H_0to1 = (H1 @ np.linalg.inv(H0)).astype(np.float32)

        if conf.photometric["name"] != "identity":
            img0 = self.photo_aug(img0, rng)
            img1 = self.photo_aug(img1, rng)

        size = np.array(self.patch_shape, np.float32)
        name = (
            str(self.image_paths[idx])
            if not isinstance(self.image_paths[idx], np.ndarray)
            else f"synthetic/{idx}"
        )
        view0 = {
            "image": img0.astype(np.float32),
            "image_size": size.copy(),
            "H_": H0.astype(np.float32),
        }
        view1 = {
            "image": img1.astype(np.float32),
            "image_size": size.copy(),
            "H_": H1.astype(np.float32),
        }
        feats = self._load_cached_features(Path(name).name)
        if feats is not None:
            view0["cache"] = self._warp_cached_features(feats, H0)
            view1["cache"] = self._warp_cached_features(feats, H1)
        return {
            "view0": view0,
            "view1": view1,
            "H_0to1": H_0to1,
            "idx": idx,
            "name": Path(name).name,
        }


class HomographyDataset(BaseDataset):
    default_conf = {
        "data_dir": "revisitop1m",
        "image_dir": "jpg",
        "glob": ["*.jpg", "*.png", "*.jpeg", "*.JPG", "*.PNG"],
        "train_size": 100,
        "val_size": 10,
        "shuffle_seed": 0,
        "grayscale": False,
        "reseed": False,
        "homography": {
            "difficulty": 0.8,
            "translation": 1.0,
            "max_angle": 60,
            "patch_shape": [640, 480],
        },
        "photometric": {"name": "lg", "p": 0.95},
        "synthetic": {"enable": False, "num_images": 200, "size": [640, 480]},
        # cached-feature training (reference `homographies.py:460-530`):
        # load exported per-image features and warp them through the sampled
        # homographies instead of extracting on the fly
        "load_features": {
            "do": False,
            "path": "exports/features.h5",  # relative to DATA_PATH
            "max_num_keypoints": 1024,
            "thresh": -1.0,
        },
    }

    def _init(self, conf):
        if conf.synthetic["enable"]:
            rng = np.random.RandomState(conf.get("shuffle_seed", 0) or 0)
            w, h = conf.synthetic["size"]
            n = conf.synthetic["num_images"]
            self.images = [generate_synthetic_image(rng, w, h) for _ in range(n)]
        else:
            data_dir = DATA_PATH / conf.data_dir / conf.image_dir
            paths = []
            for g in conf.glob:
                paths += list(data_dir.glob("**/" + g))
            if not paths:
                raise FileNotFoundError(
                    f"no images in {data_dir}; set data.synthetic.enable=true "
                    "for procedural data"
                )
            paths = sorted(paths)
            if conf.get("shuffle_seed") is not None:
                np.random.RandomState(conf.shuffle_seed).shuffle(paths)
            self.images = paths

        train_n = conf.train_size
        val_n = conf.val_size
        self.splits = {
            "train": self.images[:train_n],
            "val": self.images[train_n : train_n + val_n],
            "test": self.images[train_n : train_n + val_n],
        }

    def get_dataset(self, split):
        return _HomographyTorchlessDataset(self.conf, self.splits[split], split)
