"""Endomapper pairs with cached RoMa dense warps for pseudo-GT training
(reference `gluefactory/datasets/endomapper_roma.py:41-561`).

Per-pair warp caches live in `DATA_PATH/<warps_dir>/<map>/<name0>_<name1>.npz`
with keys `warp_0to1` (H, W, 2), `certainty_0to1` (H, W), optional
`warp_1to0` — produced offline by a dense matcher (the fork's
`tools/preprocess_endomapper_romaGT.py` analog is
`scripts/export_local_features.py`-style caching of RoMa outputs).
Samples carry the warps so `roma_gt_matcher` can supervise any matcher.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .. import logger
from ..settings import DATA_PATH
from .base_dataset import BaseDataset
from .endomapper_dense import EndomapperDense, _EndomapperDensePairs

__main_class__ = "EndomapperRoma"


class _EndomapperRomaPairs(_EndomapperDensePairs):
    def __init__(self, conf, maps, split, root, warps_dir):
        self.warps_dir = Path(warps_dir)
        super().__init__(conf, maps, split, root)

    def sample_new_items(self, seed):
        super().sample_new_items(seed)
        # keep only pairs with a cached warp
        kept = []
        for map_name, i0, i1 in self.items:
            m = self.maps[map_name]
            n0 = Path(str(m["image_names"][i0])).stem
            n1 = Path(str(m["image_names"][i1])).stem
            if (self.warps_dir / map_name / f"{n0}_{n1}.npz").exists():
                kept.append((map_name, i0, i1))
        if len(kept) < len(self.items):
            logger.info(
                f"endomapper_roma: {len(kept)}/{len(self.items)} pairs have "
                "cached warps"
            )
        self.items = kept

    def __getitem__(self, i):
        data = super().__getitem__(i)
        map_name, i0, i1 = self.items[i]
        m = self.maps[map_name]
        n0 = Path(str(m["image_names"][i0])).stem
        n1 = Path(str(m["image_names"][i1])).stem
        cache = np.load(self.warps_dir / map_name / f"{n0}_{n1}.npz")
        data["roma_warp_0to1"] = cache["warp_0to1"].astype(np.float32)
        data["roma_certainty_0to1"] = cache["certainty_0to1"].astype(np.float32)
        if "warp_1to0" in cache:
            data["roma_warp_1to0"] = cache["warp_1to0"].astype(np.float32)
        return data


class EndomapperRoma(EndomapperDense):
    default_conf = {
        "warps_dir": "endomapper/roma_warps",
    }

    def get_dataset(self, split):
        if split not in self._splits:
            self._splits[split] = _EndomapperRomaPairs(
                self.conf,
                self._maps_for(split),
                split,
                DATA_PATH / self.conf.images_dir,
                DATA_PATH / self.conf.warps_dir,
            )
        return self._splits[split]
