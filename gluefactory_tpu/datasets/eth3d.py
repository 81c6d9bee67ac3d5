"""ETH3D multi-view benchmark in its distributed COLMAP layout
(reference `gluefactory/datasets/eth3d.py:64-255`).

Scans `DATA_PATH/<data_dir>/<scene>/` folders holding the official
undistorted DSLR release:
  - `images/dslr_images_undistorted/*.JPG`
  - `dslr_calibration_undistorted/{cameras.txt,images.txt}` (COLMAP text)
  - optional `dslr_calibration_jpg/images.txt` (distorted camera indices)
  - `ground_truth_depth/undistorted_depth/<name>.png` (16-bit, depth*256)

Pairs are formed from point-track covisibility (shared 3D ids in
images.txt) with a `min_covisibility` threshold — the line-matching eval's
pair protocol. Loading is host-side numpy/cv2 into the framework's
fixed-shape view dicts.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from .. import logger
from ..geometry.wrappers import Camera, Pose
from ..settings import DATA_PATH
from ..utils.image import ImagePreprocessor
from .base_dataset import BaseDataset
from .endomapper_utils import read_cameras_txt, read_images_txt

__main_class__ = "ETH3DDataset"


def _qvec2rotmat(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ],
        np.float32,
    )


def _camera_from_colmap(cam, scale):
    p = np.asarray(cam["params"], np.float64)
    model = cam["model"].upper()
    if model.startswith("SIMPLE"):
        f = np.array([p[0], p[0]])
        c = p[1:3]
    else:
        f = p[0:2]
        c = p[2:4]
    return Camera(
        size=np.asarray([cam["width"] * scale, cam["height"] * scale], np.float32),
        f=(f * scale).astype(np.float32),
        c=(c * scale).astype(np.float32),
        dist=np.zeros(4, np.float32),
        model="pinhole",
    )


class _ETH3DScenePairs:
    def __init__(self, conf):
        self.conf = conf
        root = DATA_PATH / conf.data_dir
        if not root.exists():
            raise FileNotFoundError(f"ETH3D not found at {root}")
        scale = 1.0 / conf.downsize_factor
        self.items = []
        for scene_dir in sorted(p for p in root.iterdir() if p.is_dir()):
            calib = scene_dir / "dslr_calibration_undistorted"
            img_dir = scene_dir / "images" / "dslr_images_undistorted"
            if not (calib / "images.txt").exists():
                continue
            cams = read_cameras_txt(calib / "cameras.txt")
            images = read_images_txt(calib / "images.txt")
            depth_dir = scene_dir / "ground_truth_depth" / "undistorted_depth"

            recs = sorted(images.values(), key=lambda r: Path(r["name"]).name)
            names = [Path(r["name"]).name for r in recs]
            vis = [
                set(r["point3D_ids"][r["point3D_ids"] >= 0].tolist()) for r in recs
            ]
            n = len(recs)
            cov = np.zeros((n, n), np.int64)
            for i in range(n - 1):
                for j in range(i + 1, n):
                    cov[i, j] = cov[j, i] = len(vis[i] & vis[j])

            poses = []
            for r in recs:
                T = np.eye(4, dtype=np.float32)
                T[:3, :3] = _qvec2rotmat(r["qvec"])
                T[:3, 3] = r["tvec"]
                poses.append(T)

            ii, jj = np.where(np.triu(cov >= conf.min_covisibility, k=1))
            for i, j in zip(ii.tolist(), jj.tolist()):
                self.items.append(
                    {
                        "scene": scene_dir.name,
                        "names": (names[i], names[j]),
                        "img_paths": (
                            img_dir / recs[i]["name"].split("/")[-1],
                            img_dir / recs[j]["name"].split("/")[-1],
                        ),
                        "depth_paths": (
                            depth_dir / (Path(names[i]).stem + ".png"),
                            depth_dir / (Path(names[j]).stem + ".png"),
                        ),
                        "cams": (
                            _camera_from_colmap(cams[recs[i]["camera_id"]], scale),
                            _camera_from_colmap(cams[recs[j]["camera_id"]], scale),
                        ),
                        "poses": (poses[i], poses[j]),
                        "covis": int(cov[i, j]),
                    }
                )
            logger.info(
                f"eth3d[{scene_dir.name}]: {int((cov >= conf.min_covisibility).sum() // 2)} pairs"
            )
        self.pre = ImagePreprocessor(dict(conf.preprocessing))

    def __len__(self):
        return len(self.items)

    def _read_view(self, item, k):
        conf = self.conf
        img = cv2.imread(str(item["img_paths"][k]), cv2.IMREAD_COLOR)
        if img is None:
            raise IOError(f"cannot read {item['img_paths'][k]}")
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        f = 1.0 / conf.downsize_factor
        if f != 1.0:
            img = cv2.resize(
                img, None, fx=f, fy=f, interpolation=cv2.INTER_AREA
            )
        if conf.grayscale:
            img = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)[..., None]
        out = self.pre(img)
        cam = item["cams"][k].scale(np.asarray(out["scales"], np.float32))
        view = {
            "image": out["image"],
            "image_size": out["image_size"],
            "scales": out["scales"],
            "camera": cam,
            "name": item["names"][k],
        }
        dp = item["depth_paths"][k]
        if dp.exists():
            depth = cv2.imread(str(dp), cv2.IMREAD_ANYDEPTH)
            if depth is not None:
                depth = depth.astype(np.float32) / 256.0
                w, h = int(out["image_size"][0]), int(out["image_size"][1])
                depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_NEAREST)
                if conf.preprocessing["square_pad"]:
                    s = max(out["image"].shape[:2])
                    padded = np.zeros((s, s), np.float32)
                    padded[: depth.shape[0], : depth.shape[1]] = depth
                    depth = padded
                view["depth"] = depth
        return view

    def __getitem__(self, i):
        item = self.items[i]
        v0 = self._read_view(item, 0)
        v1 = self._read_view(item, 1)
        T0, T1 = item["poses"]
        T_0to1 = Pose.from_4x4mat((T1 @ np.linalg.inv(T0)).astype(np.float32))
        return {
            "view0": v0,
            "view1": v1,
            "T_0to1": T_0to1,
            "T_1to0": T_0to1.inv().float(),
            "n_covisible_points": item["covis"],
            "name": f"{item['scene']}/{v0['name']}_{v1['name']}",
            "idx": i,
        }


class ETH3DDataset(BaseDataset):
    default_conf = {
        "data_dir": "ETH3D_undistorted",
        "grayscale": False,
        "downsize_factor": 8,
        "min_covisibility": 500,
        "preprocessing": {"resize": None, "side": "long", "square_pad": True},
    }

    def _init(self, conf):
        self._ds = None

    def get_dataset(self, split):
        if self._ds is None:
            self._ds = _ETH3DScenePairs(self.conf)
        return self._ds
