"""Generic image-pair list dataset
(reference `gluefactory/datasets/image_pairs.py:47-106`).

A text file of `name0 name1 [K0... K1... qvec tvec | H(9)]` per line:
supports plain pairs, calibrated pairs with relative pose, or
homography-annotated pairs.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..geometry.wrappers import Camera, Pose
from ..settings import DATA_PATH
from ..utils.image import ImagePreprocessor, read_image
from .base_dataset import BaseDataset
from .utils import scale_intrinsics

__main_class__ = "ImagePairs"


def names_to_pair(n0: str, n1: str) -> str:
    return f"{n0.replace('/', '-')}_{n1.replace('/', '-')}"


def parse_camera(vals) -> np.ndarray:
    """9 values -> 3x3 K."""
    return np.asarray(vals, np.float32).reshape(3, 3)


class _PairList:
    def __init__(self, conf, root):
        self.conf = conf
        self.root = Path(root)
        self.preproc = ImagePreprocessor(conf.preprocessing)
        pairs_path = Path(conf.pairs)
        if not pairs_path.is_absolute():
            pairs_path = DATA_PATH / conf.pairs
        self.items = [
            line.strip().split()
            for line in pairs_path.read_text().strip().splitlines()
            if line.strip() and not line.startswith("#")
        ]

    def __len__(self):
        return len(self.items)

    def _read_view(self, name):
        img = read_image(self.root / name, self.conf.grayscale)
        out = self.preproc(img)
        out["name"] = name
        return out

    def __getitem__(self, i):
        parts = self.items[i]
        n0, n1 = parts[:2]
        v0 = self._read_view(n0)
        v1 = self._read_view(n1)
        data = {
            "view0": v0,
            "view1": v1,
            "idx": i,
            "name": names_to_pair(n0, n1),
        }
        extra = list(map(float, parts[2:]))
        if len(extra) == 9:  # homography in original coords
            H = np.asarray(extra, np.float32).reshape(3, 3)
            s0 = np.diag(np.r_[v0["scales"], 1.0]).astype(np.float32)
            s1 = np.diag(np.r_[v1["scales"], 1.0]).astype(np.float32)
            data["H_0to1"] = s1 @ H @ np.linalg.inv(s0)
        elif len(extra) == 9 + 9 + 7:  # K0, K1, qvec+tvec
            K0 = parse_camera(extra[:9])
            K1 = parse_camera(extra[9:18])
            qvec, tvec = extra[18:22], extra[22:25]
            K0 = scale_intrinsics(K0, v0["scales"])
            K1 = scale_intrinsics(K1, v1["scales"])
            v0["camera"] = Camera.from_calibration_matrix(K0, size=v0["image_size"])
            v1["camera"] = Camera.from_calibration_matrix(K1, size=v1["image_size"])
            T = Pose.from_colmap(np.asarray(qvec), np.asarray(tvec))
            data["T_0to1"] = T.float()
            data["T_1to0"] = T.inv().float()
        return data


class ImagePairs(BaseDataset):
    default_conf = {
        "pairs": "???",  # pair list txt, relative to DATA_PATH
        "root": "???",  # image root, relative to DATA_PATH
        "grayscale": False,
        "preprocessing": {"resize": None},
    }

    def _init(self, conf):
        self.root = DATA_PATH / conf.root

    def get_dataset(self, split):
        return _PairList(self.conf, self.root)


class ImageFolder(BaseDataset):
    """Flat folder of single images (export; reference `image_folder.py:15-59`)."""

    default_conf = {
        "images": "???",  # folder or glob, relative to DATA_PATH
        "glob": ["*.jpg", "*.png", "*.jpeg"],
        "grayscale": False,
        "preprocessing": {"resize": None},
    }

    def _init(self, conf):
        root = DATA_PATH / conf.images
        paths = []
        for g in conf.glob:
            paths += sorted(root.glob("**/" + g))
        self.paths = paths
        self.preproc = ImagePreprocessor(conf.preprocessing)

    def get_dataset(self, split):
        return self

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        p = self.paths[i]
        out = self.preproc(read_image(p, self.conf.grayscale))
        out["name"] = p.name
        out["idx"] = i
        return out


__main_class__ = "ImagePairs"
