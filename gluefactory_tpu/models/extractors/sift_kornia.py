"""SIFT with the kornia wrapper's conf/output conventions
(reference `gluefactory/models/extractors/sift_kornia.py:7-52`).

The reference wraps `kornia.feature.SIFTFeature` (unavailable here). This
framework already has full SIFT implementations — the OpenCV host backend
and the on-device DoG pyramid (`ops/sift_device.py`) — so kornia-parity is a
conf/output translation layer over them, not another algorithm:

  - `max_num_keypoints == -1` means "no limit" in kornia; mapped to the
    fixed-K padded representation (K = 4096) the TPU pipeline requires.
  - `rootsift` toggles RootSIFT normalization (kornia default true).
  - orientations are returned in RADIANS (the reference wrapper applies
    `torch.deg2rad`, `sift_kornia.py:43`); the base SIFT already does.
  - `has_descriptor: false` drops descriptors (detector-only mode).
"""

from __future__ import annotations

from ..base_model import BaseModel
from .sift import SIFT

__main_class__ = "KorniaSIFT"


class KorniaSIFT(BaseModel):
    default_conf = {
        "has_detector": True,
        "has_descriptor": True,
        "max_num_keypoints": -1,
        "detection_threshold": None,
        "rootsift": True,
        "backend": "opencv",  # or "device" (DoG pyramid on-chip)
        "trainable": False,
    }
    required_data_keys = ("image",)

    def setup(self):
        c = self.conf
        k = int(c.max_num_keypoints)
        self.sift = SIFT.from_conf(
            {
                "backend": c.backend,
                "max_num_keypoints": 4096 if k == -1 else k,
                "detection_threshold": (
                    float(c.detection_threshold)
                    if c.detection_threshold is not None
                    else 0.0066  # OpenCV SIFT default contrast threshold
                ),
                "rootsift": bool(c.rootsift),
                "trainable": False,
            },
            name="sift",
        )

    def _forward(self, data: dict, train: bool = False) -> dict:
        pred = self.sift(data)
        out = {
            "keypoints": pred["keypoints"],
            "scales": pred["scales"],
            "oris": pred["oris"],  # radians (base SIFT converts)
            "keypoint_scores": pred["keypoint_scores"],
            "keypoint_valid": pred["keypoint_valid"],
        }
        if self.conf.has_descriptor:
            out["descriptors"] = pred["descriptors"]
        return out

    def loss(self, pred: dict, data: dict):
        raise NotImplementedError  # matches the reference wrapper
