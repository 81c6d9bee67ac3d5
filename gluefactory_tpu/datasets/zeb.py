"""ZEB (Zero-shot Evaluation Benchmark, gim) dataset in its native layout.

Reference `gluefactory/datasets/zeb.py:24-162`: each scene directory under
`data/zeb/` holds the images plus one `.txt` per evaluation pair whose
single line is

    <img0> <img1> <ov0> <ov1> K0(9 floats) K1(9 floats) pose(12 R|t or 16 4x4)

Pair files are named `<subscene><sep><img0>[-_]<img1>.txt`; the image files
are resolved by globbing `<subscene><sep><imgX>.*` next to the pair file.
Supports scene lists/exclusions, min/max-overlap filtering, per-scene caps
with a deterministic per-scene RandomState, and optional shuffling — the
knobs the reference exposes. Test split only.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..geometry.wrappers import Camera, Pose
from ..settings import DATA_PATH
from ..utils.image import ImagePreprocessor, read_image
from .base_dataset import BaseDataset
from .utils import scale_intrinsics

__main_class__ = "ZEBPairs"


def read_pair_line(pair_file: Path) -> list:
    return pair_file.read_text().strip().splitlines()[0].rstrip().split(" ")


def parse_pair_images(pair_file: Path):
    """Resolve the two image paths encoded in a pair file's name + line."""
    vals = read_pair_line(pair_file)
    stem0 = vals[0].split(".")[0]
    stem1 = vals[1].split(".")[0]
    name = pair_file.stem
    sub = name.replace(f"{stem0}-{stem1}", "").replace(f"{stem0}_{stem1}", "")
    sub, sep = sub[:-1], sub[-1]
    hits0 = sorted(pair_file.parent.glob(f"{sub}{sep}{stem0}.*"))
    hits1 = sorted(pair_file.parent.glob(f"{sub}{sep}{stem1}.*"))
    img0 = next((p for p in hits0 if p.suffix != ".txt"), None)
    img1 = next((p for p in hits1 if p.suffix != ".txt"), None)
    if img0 is None or img1 is None:
        raise FileNotFoundError(f"images for pair file {pair_file}")
    return img0, img1, vals[2:]


def parse_rel_pose(vals) -> Pose:
    import jax.numpy as jnp

    arr = np.asarray([float(x) for x in vals], np.float32)
    if arr.size == 12:
        return Pose.from_Rt(jnp.asarray(arr[:9].reshape(3, 3)),
                            jnp.asarray(arr[9:12]))
    if arr.size == 16:
        return Pose.from_4x4mat(jnp.asarray(arr.reshape(4, 4)))
    raise ValueError(f"cannot interpret pose of {arr.size} values")


class _ZEBSet:
    def __init__(self, conf, items):
        self.conf = conf
        self.items = items
        self.preproc = ImagePreprocessor(conf.preprocessing)

    def __len__(self):
        return len(self.items)

    def _read_view(self, path: Path):
        img = read_image(path, grayscale=False)
        out = self.preproc(img)
        out["name"] = path.name
        return out

    def __getitem__(self, i):
        pair_file = self.items[i]
        img0, img1, vals = parse_pair_images(pair_file)
        v0 = self._read_view(img0)
        v1 = self._read_view(img1)
        ov = min(float(vals[0]), float(vals[1]))
        K0 = np.asarray([float(x) for x in vals[2:11]], np.float32).reshape(3, 3)
        K1 = np.asarray([float(x) for x in vals[11:20]], np.float32).reshape(3, 3)
        K0 = scale_intrinsics(K0, v0["scales"])
        K1 = scale_intrinsics(K1, v1["scales"])
        v0["camera"] = Camera.from_calibration_matrix(K0, size=v0["image_size"])
        v1["camera"] = Camera.from_calibration_matrix(K1, size=v1["image_size"])
        T = parse_rel_pose(vals[20:])
        return {
            "view0": v0,
            "view1": v1,
            "T_0to1": T,
            "T_1to0": T.inv(),
            "idx": i,
            "overlap_0to1": np.float32(ov),
            "scene": pair_file.parent.name,
            "name": f"{pair_file.parent.name}/{pair_file.stem}",
        }


class ZEBPairs(BaseDataset):
    default_conf = {
        "root": "zeb",
        "preprocessing": ImagePreprocessor.default_conf,
        "scene_list": None,       # list of names, or a txt file under root
        "exclude_scenes": None,
        "shuffle": False,
        "seed": 42,
        "max_per_scene": None,
        "min_overlap": 0.0,
        "max_overlap": 1.0,
        "batch_size": 1,
        "test_batch_size": 1,
        "num_workers": 2,
    }

    def _init(self, conf):
        self.root = Path(conf.root)
        if not self.root.is_absolute():
            self.root = DATA_PATH / conf.root
        if not self.root.exists():
            raise FileNotFoundError(
                f"ZEB root {self.root} missing (format: data/zeb/<scene>/"
                f"<images + per-pair txt files>)")
        if isinstance(conf.scene_list, str):
            scenes = (self.root / conf.scene_list).read_text().split()
        elif conf.scene_list:
            scenes = list(conf.scene_list)
        else:
            scenes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        if conf.exclude_scenes:
            scenes = [s for s in scenes if s not in set(conf.exclude_scenes)]
        self.scenes = scenes

        items = []
        for i, scene in enumerate(sorted(scenes)):
            pair_files = sorted((self.root / scene).glob("*.txt"))
            if conf.min_overlap > 0.0 or conf.max_overlap < 1.0:
                keep = []
                for pf in pair_files:
                    vals = read_pair_line(pf)[2:4]
                    ov = min(float(vals[0]), float(vals[1]))
                    if conf.min_overlap <= ov <= conf.max_overlap:
                        keep.append(pf)
                pair_files = keep
            if conf.max_per_scene and len(pair_files) > conf.max_per_scene:
                idx = np.random.RandomState(i).choice(
                    len(pair_files), conf.max_per_scene, replace=False)
                pair_files = [pair_files[int(j)] for j in sorted(idx)]
            items.extend(pair_files)
        if conf.shuffle:
            items = sorted(items, key=lambda p: p.stem)
            np.random.RandomState(conf.seed).shuffle(items)
        self.items = items

    def get_dataset(self, split):
        assert split == "test", "ZEB has no train/val splits"
        return _ZEBSet(self.conf, self.items)
