"""Golden boat-pair integration check
(reference `tests/test_integration.py:50-135`).

The reference's end-to-end accuracy gate: run SuperPoint + LightGlue with the
OFFICIAL weights on its boat image pair, evaluate through the full
matching + homography-RANSAC stack, and assert the published floors
(num_matches > 1300, prec@3px > 0.8, H_error_ransac < 1.0).

This machine has no egress, so the official torch checkpoints cannot be
downloaded here. The check is therefore weight-gated: it activates the day
the checkpoints are mounted at

    DATA_PATH/weights/superpoint_v1.pth            (MagicLeap SuperPoint)
    DATA_PATH/weights/superpoint_lightglue.pth     (LightGlue official, SP)

(`tests/test_golden_weights.py` skips with a reason naming these paths;
`tools/prove_parity.py` runs convert -> golden -> benchmark diff in one
command.) The conversion leg itself is covered weight-free by
`tests/test_torch_weights.py` (structure) and `tests/test_torch_parity.py`
(forward numerics vs the actual reference torch models).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..settings import DATA_PATH

# GT homography of the reference's boat pair
# (reference `tests/test_integration.py:75-82`)
BOAT_H_0TO1 = np.array(
    [
        [0.85799, 0.21669, 9.4839],
        [-0.21177, 0.85855, 130.48],
        [1.5015e-06, 9.2033e-07, 1.0],
    ],
    np.float64,
)

WEIGHTS_DIR = DATA_PATH / "weights"
OFFICIAL_WEIGHTS = {
    "superpoint": WEIGHTS_DIR / "superpoint_v1.pth",
    "lightglue": WEIGHTS_DIR / "superpoint_lightglue.pth",
}

# floors from the reference integration test (`tests/test_integration.py:51-63`)
GOLDEN_FLOORS = {"num_matches": 1300, "prec@3px": 0.8, "H_error_ransac": 1.0}


def find_boat_images() -> tuple[Path, Path] | None:
    """Locate the boat pair: mounted data first, then the reference assets."""
    for root in (DATA_PATH / "assets", Path("/root/reference/assets")):
        p0, p1 = root / "boat1.png", root / "boat2.png"
        if p0.exists() and p1.exists():
            return p0, p1
    return None


def official_weights_available() -> bool:
    return all(p.exists() for p in OFFICIAL_WEIGHTS.values())


def build_official_pipeline(
    sp_weights=None, lg_weights=None, max_num_keypoints: int = 2048
):
    """SP+LG TwoViewPipeline with converted official weights.

    `sp_weights`/`lg_weights` may be paths to torch checkpoints or
    already-loaded state dicts (for fixture-shaped smoke tests).
    Conf mirrors `configs/superpoint+lightglue-official.yaml`.
    """
    from ..models import get_model
    from ..utils.torch_weights import (
        convert_lightglue,
        convert_superpoint,
        load_torch_state_dict,
    )

    def as_sd(x, default_path):
        if x is None:
            x = default_path
        if isinstance(x, (str, Path)):
            return load_torch_state_dict(x)
        return x

    sp_sd = as_sd(sp_weights, OFFICIAL_WEIGHTS["superpoint"])
    lg_sd = as_sd(lg_weights, OFFICIAL_WEIGHTS["lightglue"])
    sp_vars = convert_superpoint(sp_sd)
    lg_vars = convert_lightglue(lg_sd, n_layers=9)

    model_conf = {
        "name": "two_view_pipeline",
        "extractor": {
            "name": "superpoint",
            "channels": [64, 64, 128, 128, 256],
            "norm": "none",
            "max_num_keypoints": max_num_keypoints,
            "detection_threshold": 0.0,
            "nms_radius": 3,
            "trainable": False,
        },
        "matcher": {
            "name": "lightglue",
            "filter_threshold": 0.1,
            "trainable": False,
        },
    }
    model = get_model("two_view_pipeline").from_conf(model_conf)
    variables = {
        "params": {
            "extractor": sp_vars["params"],
            "matcher": lg_vars["params"],
        }
    }
    return model, variables


def _load_boat_data(h_gt=BOAT_H_0TO1):
    """Boat pair as a batch-1 NHWC grayscale data dict (pads W to /8)."""
    from ..utils.image import read_image

    paths = find_boat_images()
    if paths is None:
        raise FileNotFoundError(
            f"boat pair not found under {DATA_PATH/'assets'} or the reference"
        )
    views = {}
    for i, p in enumerate(paths):
        img = read_image(p, grayscale=True).astype(np.float32)
        if img.ndim == 2:
            img = img[..., None]
        H, W = img.shape[:2]
        H8, W8 = -(-H // 8) * 8, -(-W // 8) * 8
        padded = np.zeros((H8, W8, 1), np.float32)
        padded[:H, :W] = img
        views[f"view{i}"] = {
            "image": padded[None],
            "image_size": np.array([[W, H]], np.float32),
        }
    return {
        **views,
        "H_0to1": h_gt[None].astype(np.float32),
        "H_1to0": np.linalg.inv(h_gt)[None].astype(np.float32),
    }


def run_boat_golden(
    model=None,
    variables=None,
    estimator: str = "device_lo_ransac",
    max_num_keypoints: int = 2048,
    h_gt=BOAT_H_0TO1,
) -> dict:
    """Forward the boat pair and evaluate matches + robust homography.

    Returns the metric dict the reference integration test asserts on
    (num_matches, prec@1px/3px, H_error_dlt, H_error_ransac).
    """
    import jax

    from ..core.config import Config
    from .utils import (
        eval_homography_dlt,
        eval_homography_robust,
        eval_matches_homography,
    )

    if model is None or variables is None:
        model, variables = build_official_pipeline(
            max_num_keypoints=max_num_keypoints
        )
    data = _load_boat_data(h_gt)
    pred = jax.device_get(
        jax.jit(lambda v, d: model.apply(v, d))(
            variables, {k: v for k, v in data.items() if k.startswith("view")}
        )
    )
    pred = {k: np.asarray(v)[0] for k, v in pred.items() if hasattr(v, "ndim")}
    pair = {k: np.asarray(v)[0] for k, v in data.items() if k.startswith("H_")}
    pair["view0"] = {"image_size": np.asarray(data["view0"]["image_size"])[0]}
    results = eval_matches_homography(pair, pred)
    results.update(eval_homography_dlt(pair, pred))
    results.update(
        eval_homography_robust(
            pair, pred, Config({"estimator": estimator, "ransac_th": 3.0})
        )
    )
    return {k: float(np.asarray(v)) for k, v in results.items()}
