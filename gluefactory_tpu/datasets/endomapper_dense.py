"""Endomapper dense dataset: real endoscopy frames + dense depth + specular
masks (reference `gluefactory/datasets/endomapper_dense.py:35-603`).

Extends the map-based Endomapper sampler with image/depth loading: the map
npz additionally stores `image_paths` and `depth_paths` (relative to
DATA_PATH/<images_dir>), KB4 cameras, and the overlap matrix. Views carry
images + dense depth + computed specular masks, so dense-depth GT
(`depth_matcher`) and full extraction pipelines run on endoscopy.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from ..geometry.wrappers import Camera, Pose
from ..settings import DATA_PATH
from ..utils.image import ImagePreprocessor, read_image
from .base_dataset import BaseDataset
from .endomapper import Endomapper, _EndomapperPairs
from .endomapper_utils import compute_specular_mask
from .utils import scale_intrinsics

__main_class__ = "EndomapperDense"


class _EndomapperDensePairs(_EndomapperPairs):
    def __init__(self, conf, maps, split, root):
        self.root = Path(root)
        self.preproc = ImagePreprocessor(conf.preprocessing)
        super().__init__(conf, maps, split)

    def _read_view(self, m, idx):
        conf = self.conf
        img_path = self.root / str(m["image_paths"][idx])
        img = read_image(img_path, conf.get("grayscale", False))
        out = self.preproc(img)

        # KB4 camera scaled to the resized image
        f = np.asarray(m["camera_f"], np.float32) * out["scales"]
        c = np.asarray(m["camera_c"], np.float32) * out["scales"]
        cam = Camera(
            size=np.asarray(out["image_size"], np.float32),
            f=f,
            c=c,
            dist=np.asarray(m["camera_dist"], np.float32)[:4],
            model="kb4",
        )

        view = {
            "image": out["image"],
            "image_size": out["image_size"],
            "scales": out["scales"],
            "camera": cam,
            "T_w2cam": Pose.from_4x4mat(m["poses"][idx]),
            "name": str(m["image_names"][idx]),
        }
        if "depth_paths" in m and m["depth_paths"] is not None:
            dpath = self.root / str(m["depth_paths"][idx])
            if str(dpath).endswith(".npz"):
                depth = np.load(dpath)["depth"].astype(np.float32)
            else:
                import h5py

                with h5py.File(str(dpath), "r") as fh:
                    key = "depth" if "depth" in fh else list(fh.keys())[0]
                    depth = fh[key].__array__().astype(np.float32)
            w, h = int(out["image_size"][0]), int(out["image_size"][1])
            depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_NEAREST)
            if conf.preprocessing["square_pad"]:
                s = max(out["image"].shape[:2])
                padded = np.zeros((s, s), np.float32)
                padded[: depth.shape[0], : depth.shape[1]] = depth
                depth = padded
            view["depth"] = depth
        if conf.get("specular_masks", True):
            mask = compute_specular_mask(out["image"])
            view["specular_mask"] = mask
        return view


class EndomapperDense(Endomapper):
    default_conf = {
        "images_dir": "endomapper",
        "preprocessing": {"resize": 480, "side": "long", "square_pad": True},
        "specular_masks": True,
        "grayscale": False,
    }

    def get_dataset(self, split):
        if split not in self._splits:
            self._splits[split] = _EndomapperDensePairs(
                self.conf,
                self._maps_for(split),
                split,
                DATA_PATH / self.conf.images_dir,
            )
        return self._splits[split]
