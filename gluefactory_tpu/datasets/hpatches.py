"""HPatches dataset (reference `gluefactory/datasets/hpatches.py:37-148`).

116 sequences x 5 pairs (ref image 1 vs images 2..6) with GT homographies
`H_1_k` in text files. Expects the standard `hpatches-sequences-release`
layout under DATA_PATH (auto-download needs egress; in air-gapped pods mount
the data). Images are resized (max side) with scale bookkeeping and the GT H
is adapted to the resized coords at eval time via per-view `scales`.
"""

from __future__ import annotations

import numpy as np

from ..settings import DATA_PATH
from ..utils.image import ImagePreprocessor, read_image
from .base_dataset import BaseDataset

__main_class__ = "HPatches"


def read_homography(path) -> np.ndarray:
    with open(path) as f:
        result = []
        for line in f.readlines():
            while "  " in line:
                line = line.replace("  ", " ")
            line = line.replace(" \n", "").replace("\n", "")
            for elem in line.split(" "):
                if elem != "":
                    result.append(elem)
    return np.array(result, np.float32).reshape(3, 3)


class _HPatchesPairs:
    def __init__(self, conf, root, items):
        self.conf = conf
        self.root = root
        self.items = items  # list of (seq, idx 2..6)
        self.preproc = ImagePreprocessor(conf.preprocessing)

    def __len__(self):
        return len(self.items)

    def _read_view(self, seq, idx):
        img = read_image(self.root / seq / f"{idx}.ppm", self.conf.grayscale)
        out = self.preproc(img)
        return out

    def __getitem__(self, i):
        seq, idx = self.items[i]
        view0 = self._read_view(seq, 1)
        view1 = self._read_view(seq, idx)
        H = read_homography(self.root / seq / f"H_1_{idx}")
        # adapt H to the resized coordinates of both views
        s0 = np.diag(np.r_[view0["scales"], 1.0]).astype(np.float32)
        s1 = np.diag(np.r_[view1["scales"], 1.0]).astype(np.float32)
        H_scaled = s1 @ H @ np.linalg.inv(s0)
        return {
            "view0": view0,
            "view1": view1,
            "H_0to1": H_scaled.astype(np.float32),
            "H_0to1_orig": H.astype(np.float32),
            "idx": i,
            "name": f"{seq}/{idx}.ppm",
            "scene": seq,
        }


class HPatches(BaseDataset):
    default_conf = {
        "data_dir": "hpatches-sequences-release",
        "subset": None,  # "i" (illumination) | "v" (viewpoint) | None
        "ignore_large_images": True,
        "grayscale": False,
        "preprocessing": {"resize": 480, "side": "short"},
    }

    # sequences too large for the original benchmark protocol
    large = ["i_contruction", "i_crownnight", "i_dc", "i_pencils", "i_whitebuilding", "v_artisans", "v_astronautis", "v_talent"]

    def _init(self, conf):
        self.root = DATA_PATH / conf.data_dir
        if not self.root.exists():
            raise FileNotFoundError(
                f"HPatches not found at {self.root}; mount the dataset "
                "(hpatches-sequences-release)"
            )
        seqs = sorted(p.name for p in self.root.iterdir() if p.is_dir())
        if conf.ignore_large_images:
            seqs = [s for s in seqs if s not in self.large]
        if conf.subset:
            seqs = [s for s in seqs if s.startswith(conf.subset)]
        self.items = [(s, i) for s in seqs for i in range(2, 7)]

    def get_dataset(self, split):
        assert split in ("test", "val")
        return _HPatchesPairs(self.conf, self.root, self.items)
