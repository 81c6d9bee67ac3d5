"""Endomapper dense dataset: real endoscopy frames + dense depth + specular
masks (reference `gluefactory/datasets/endomapper_dense.py:35-603`).

Extends the map-based Endomapper sampler with image/depth loading. Per the
reference's production behavior:
  - per-frame validity from file existence (image/depth/specular), with
    corrupted frames masked out of the overlap matrix before sampling and
    forensics logged (`endomapper_dense.py:202-229`, `endomapper.py:292-318`);
  - dense depth stored as npz `{depth, mask}`; invalid pixels zeroed, and a
    per-image `depth_scale` (COLMAP-to-dense median ratio computed by
    `tools/preprocess_endomapper_dense.py`) applied on load
    (`preprocess_endomapper_dense.py:132-178`);
  - specular masks loaded from packbits npz files when paths are present
    (`endomapper_dense.py:433-456`), else computed from the image;
  - optional +-90-degree rotation augmentation updating intrinsics and pose
    (`endomapper_dense.py:459-481`, p_rotate);
  - negative pairs (overlap <= 0) mixed in when `num_neg` is set
    (`endomapper_dense.py:365-372`).
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from .. import logger
from ..geometry.wrappers import Camera, Pose
from ..settings import DATA_PATH
from ..utils.image import ImagePreprocessor, read_image
from .base_dataset import BaseDataset
from .endomapper import Endomapper, _EndomapperPairs
from .endomapper_utils import compute_specular_mask
from .utils import rotate_intrinsics, rotate_pose_inplane

__main_class__ = "EndomapperDense"


def _load_depth_npz(path: Path) -> np.ndarray:
    """Masked dense-depth npz: invalid pixels -> 0 (reference
    `endomapper_dense.py:407-419`)."""
    with np.load(str(path)) as d:
        depth = d["depth"].astype(np.float32)
        if "mask" in d:
            mask = d["mask"].astype(bool)
            if mask.shape != depth.shape:
                raise ValueError(f"depth/mask shape mismatch in {path}")
            depth = np.where(mask, depth, 0.0).astype(np.float32)
    return depth


def _load_specular_npz(path: Path) -> np.ndarray:
    """Packbits specular mask npz (reference `endomapper_dense.py:433-449`)."""
    with np.load(str(path)) as d:
        if "mask_packbits" in d and "mask_shape" in d:
            h, w = d["mask_shape"].astype(np.int64).tolist()
            flat = np.unpackbits(d["mask_packbits"], count=int(h * w))
            return flat.reshape(h, w).astype(bool)
        if "mask" in d:
            return d["mask"].astype(bool)
    raise KeyError(f"no specular mask arrays in {path}")


class _EndomapperDensePairs(_EndomapperPairs):
    def __init__(self, conf, maps, split, root):
        self.root = Path(root)
        self.preproc = ImagePreprocessor(conf.preprocessing)
        # per-frame validity: every referenced file must exist; corrupted
        # frames are masked from the overlap matrix (forensics, not crashes)
        self.valid = {}
        for name, m in maps.items():
            n = len(m["image_names"])
            v = np.ones(n, bool)
            for key in ("image_paths", "depth_paths", "specular_mask_paths"):
                if key in m and m[key] is not None:
                    exists = np.array(
                        [(self.root / str(p)).exists() for p in m[key]], bool
                    )
                    if key == "specular_mask_paths" and not conf.get(
                        "require_specular_files", False
                    ):
                        continue  # computed fallback available
                    v &= exists
            if v.sum() < n:
                logger.warning(
                    f"endomapper_dense[{name}]: {n - int(v.sum())}/{n} frames "
                    "missing files; masked out"
                )
            self.valid[name] = v
        super().__init__(conf, maps, split)

    def sample_new_items(self, seed: int):
        conf = self.conf
        # mask invalid frames out of each overlap matrix, then defer to the
        # binned sampler; add negative pairs if configured
        patched = {}
        for name, m in self.maps.items():
            v = self.valid.get(name)
            if v is None or v.all():
                patched[name] = m
                continue
            if not v.any():
                logger.warning(f"endomapper_dense[{name}]: no valid frames")
                continue
            m = dict(m)
            ov = np.array(m["overlap_matrix"], np.float32, copy=True)
            ov[~v, :] = -1.0
            ov[:, ~v] = -1.0
            m["overlap_matrix"] = ov
            patched[name] = m
        orig_maps = self.maps
        self.maps = patched
        super().sample_new_items(seed)
        num_neg = conf.get("num_neg", 0) or 0
        if num_neg > 0:
            rng = np.random.RandomState(seed + 1)
            for name, m in patched.items():
                ov = m["overlap_matrix"]
                neg = np.stack(np.where(np.triu(ov <= 0.0, k=1)), -1)
                v = self.valid.get(name)
                if v is not None:
                    keep = v[neg[:, 0]] & v[neg[:, 1]]
                    neg = neg[keep]
                if len(neg) > num_neg:
                    neg = neg[rng.choice(len(neg), num_neg, replace=False)]
                self.items += [(name, int(i), int(j)) for i, j in neg]
            rng.shuffle(self.items)
        self.maps = orig_maps

    def _rotation_k(self, idx_pair_seed):
        """Per-sample rotation draw (+-90 deg with prob p_rotate)."""
        p = float(self.conf.get("p_rotate", 0.0) or 0.0)
        if p <= 0.0 or self.split != "train":
            return 0
        rng = np.random.RandomState(
            (int(self.conf.get("seed", 0)) * 1_000_003 + idx_pair_seed) % (2**31)
        )
        if rng.rand() >= p:
            return 0
        return int(rng.choice([-1, 1]))

    def _read_view(self, m, idx, rot_k: int = 0):
        conf = self.conf
        img_path = self.root / str(m["image_paths"][idx])
        img = read_image(img_path, conf.get("grayscale", False))

        K = np.array(
            [
                [float(m["camera_f"][0]), 0.0, float(m["camera_c"][0])],
                [0.0, float(m["camera_f"][1]), float(m["camera_c"][1])],
                [0.0, 0.0, 1.0],
            ],
            np.float32,
        )
        T = np.asarray(m["poses"][idx], np.float32)
        dist = np.asarray(m["camera_dist"], np.float32)[:4]

        depth = None
        if "depth_paths" in m and m["depth_paths"] is not None:
            dpath = self.root / str(m["depth_paths"][idx])
            if str(dpath).endswith(".npz"):
                depth = _load_depth_npz(dpath)
            else:
                import h5py

                with h5py.File(str(dpath), "r") as fh:
                    key = "depth" if "depth" in fh else list(fh.keys())[0]
                    depth = fh[key].__array__().astype(np.float32)
            scale_arr = m.get("depth_scale")
            if scale_arr is not None:
                depth = depth * float(np.asarray(scale_arr)[idx])

        spec = None
        if conf.get("specular_masks", True):
            spath = m.get("specular_mask_paths")
            if spath is not None and (self.root / str(spath[idx])).exists():
                spec = _load_specular_npz(self.root / str(spath[idx]))

        if rot_k != 0:
            # cv2 ROTATE_90_CLOCKWISE == np.rot90(k=-1)
            wh = (img.shape[1], img.shape[0])
            img = np.ascontiguousarray(np.rot90(img, k=rot_k))
            if depth is not None:
                depth = np.ascontiguousarray(np.rot90(depth, k=rot_k))
            if spec is not None:
                spec = np.ascontiguousarray(np.rot90(spec, k=rot_k))
            K = rotate_intrinsics(K, wh, rot=rot_k % 4)
            T = rotate_pose_inplane(T, rot=rot_k % 4)

        out = self.preproc(img)
        f = np.array([K[0, 0], K[1, 1]], np.float32) * out["scales"]
        c = np.array([K[0, 2], K[1, 2]], np.float32) * out["scales"]
        cam = Camera(
            size=np.asarray(out["image_size"], np.float32),
            f=f,
            c=c,
            dist=dist,
            model="kb4",
        )

        view = {
            "image": out["image"],
            "image_size": out["image_size"],
            "scales": out["scales"],
            "camera": cam,
            "T_w2cam": Pose.from_4x4mat(T),
            "name": str(m["image_names"][idx]),
        }
        if depth is not None:
            w, h = int(out["image_size"][0]), int(out["image_size"][1])
            depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_NEAREST)
            if conf.preprocessing["square_pad"]:
                s = max(out["image"].shape[:2])
                padded = np.zeros((s, s), np.float32)
                padded[: depth.shape[0], : depth.shape[1]] = depth
                depth = padded
            view["depth"] = depth
        if conf.get("specular_masks", True):
            if spec is not None:
                w, h = int(out["image_size"][0]), int(out["image_size"][1])
                spec = (
                    cv2.resize(
                        spec.astype(np.uint8), (w, h),
                        interpolation=cv2.INTER_NEAREST,
                    )
                    > 0
                )
                if conf.preprocessing["square_pad"]:
                    s = max(out["image"].shape[:2])
                    padded = np.zeros((s, s), bool)
                    padded[: spec.shape[0], : spec.shape[1]] = spec
                    spec = padded
                view["specular_mask"] = spec
            else:
                view["specular_mask"] = compute_specular_mask(out["image"])
        return view

    def __getitem__(self, i):
        map_name, i0, i1 = self.items[i]
        m = self.maps[map_name]
        rot_k = self._rotation_k(i)
        v0 = self._read_view(m, i0, rot_k)
        v1 = self._read_view(m, i1, rot_k)
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


class EndomapperDense(Endomapper):
    default_conf = {
        "images_dir": "endomapper",
        "preprocessing": {"resize": 480, "side": "long", "square_pad": True},
        "specular_masks": True,
        "require_specular_files": False,
        "grayscale": False,
        "p_rotate": 0.0,
        "num_neg": 0,
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
