"""Generic posed-pair eval dataset
(reference `gluefactory/datasets/posed_images.py:85-350`).

Used by megadepth1500 / scannet1500 / endomapper_dense1500: a `views.txt`
(name, camera params, qvec, tvec per line) + `pairs.txt` (name0 name1 per
line), optional per-view depth (h5 `/depth` or npz), optional specular masks.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import h5py
import numpy as np

from ..geometry.wrappers import Camera, Pose
from ..settings import DATA_PATH
from ..utils.image import ImagePreprocessor, read_image
from .base_dataset import BaseDataset
from .utils import scale_intrinsics

__main_class__ = "PosedImageDataset"


def parse_views_txt(path: Path) -> dict:
    """Each line: name w h fx fy cx cy [dist...] qw qx qy qz tx ty tz."""
    views = {}
    for line in Path(path).read_text().strip().splitlines():
        parts = line.strip().split()
        if not parts or parts[0].startswith("#"):
            continue
        name = parts[0]
        vals = list(map(float, parts[1:]))
        w, h, fx, fy, cx, cy = vals[:6]
        rest = vals[6:]
        qvec = rest[-7:-3]
        tvec = rest[-3:]
        dist = rest[:-7]
        views[name] = {
            "size": (w, h),
            "K": np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32),
            "dist": np.asarray(dist, np.float32),
            "qvec": np.asarray(qvec, np.float32),
            "tvec": np.asarray(tvec, np.float32),
        }
    return views


def parse_pairs_txt(path: Path) -> list:
    pairs = []
    for line in Path(path).read_text().strip().splitlines():
        parts = line.strip().split()
        if len(parts) >= 2 and not parts[0].startswith("#"):
            pairs.append((parts[0], parts[1]))
    return pairs


class _PosedPairs:
    def __init__(self, conf, root):
        self.conf = conf
        self.root = Path(root)
        self.preproc = ImagePreprocessor(conf.preprocessing)
        self.views = parse_views_txt(self.root / conf.views_file)
        self.pairs = parse_pairs_txt(self.root / conf.pairs_file)

    def __len__(self):
        return len(self.pairs)

    def _read_view(self, name):
        conf = self.conf
        img = read_image(self.root / conf.image_dir / name, conf.grayscale)
        meta = self.views[name]
        out = self.preproc(img)
        K = scale_intrinsics(meta["K"], out["scales"])
        if len(meta["dist"]) >= 4 and conf.camera_model == "kb4":
            cam = Camera(
                size=np.asarray(out["image_size"], np.float32),
                f=np.array([K[0, 0], K[1, 1]], np.float32),
                c=np.array([K[0, 2], K[1, 2]], np.float32),
                dist=meta["dist"][:4],
                model="kb4",
            )
        else:
            cam = Camera.from_calibration_matrix(K, size=out["image_size"])
        out["camera"] = cam
        out["T_w2cam"] = Pose.from_colmap(meta["qvec"], meta["tvec"])
        # depth
        if conf.depth_dir is not None:
            stem = Path(name).stem
            h5p = self.root / conf.depth_dir / f"{stem}.h5"
            npzp = self.root / conf.depth_dir / f"{stem}.npz"
            depth = None
            if h5p.exists():
                with h5py.File(str(h5p), "r") as f:
                    key = "/depth" if "depth" in f else list(f.keys())[0]
                    depth = f[key].__array__().astype(np.float32)
            elif npzp.exists():
                depth = np.load(npzp)["depth"].astype(np.float32)
            if depth is not None:
                w, h = int(out["image_size"][0]), int(out["image_size"][1])
                depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_NEAREST)
                if conf.preprocessing["square_pad"]:
                    s = max(out["image"].shape[:2])
                    padded = np.zeros((s, s), np.float32)
                    padded[: depth.shape[0], : depth.shape[1]] = depth
                    depth = padded
                out["depth"] = depth * conf.depth_scale
        # endoscope specular masks (fork `posed_images.py:111-216`): load if
        # cached on disk, else compute from image brightness
        if conf.specular_masks:
            mask_path = self.root / str(conf.specular_masks) / f"{Path(name).stem}.npz"
            if mask_path.exists():
                m = np.load(mask_path)["mask"].astype(bool)
                m = cv2.resize(
                    m.astype(np.uint8),
                    (int(out["image_size"][0]), int(out["image_size"][1])),
                    interpolation=cv2.INTER_NEAREST,
                ).astype(bool)
            else:
                from .endomapper_utils import compute_specular_mask

                m = compute_specular_mask(out["image"])
            if conf.preprocessing["square_pad"]:
                s = max(out["image"].shape[:2])
                padded = np.zeros((s, s), bool)
                padded[: m.shape[0], : m.shape[1]] = m
                m = padded
            out["specular_mask"] = m
        out["name"] = name
        return out

    def __getitem__(self, i):
        n0, n1 = self.pairs[i]
        v0 = self._read_view(n0)
        v1 = self._read_view(n1)
        T0 = v0.pop("T_w2cam")
        T1 = v1.pop("T_w2cam")
        T_0to1 = (T1 @ T0.inv()).float()
        return {
            "view0": v0,
            "view1": v1,
            "T_0to1": T_0to1,
            "T_1to0": T_0to1.inv().float(),
            "idx": i,
            "name": f"{n0}_{n1}".replace("/", "-"),
        }


class PosedImageDataset(BaseDataset):
    default_conf = {
        "data_dir": "???",
        "image_dir": "images",
        "views_file": "views.txt",
        "pairs_file": "pairs.txt",
        "depth_dir": None,
        "depth_scale": 1.0,
        "grayscale": False,
        "camera_model": "pinhole",
        "specular_masks": None,  # dir of {stem}.npz masks, or truthy to compute
        "preprocessing": {"resize": 1024, "side": "long", "square_pad": True},
    }

    def _init(self, conf):
        self.root = DATA_PATH / conf.data_dir
        if not self.root.exists():
            raise FileNotFoundError(f"dataset not found at {self.root}")

    def get_dataset(self, split):
        return _PosedPairs(self.conf, self.root)
