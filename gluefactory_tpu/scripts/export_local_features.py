"""Feature-cache exporter
(reference `gluefactory/scripts/export_local_features.py` and
`export_megadepth.py:16-...`).

Runs an extractor over a dataset split and caches per-image features
(keypoints/scores/descriptors, optionally keypoint depths) to HDF5 for
CacheLoader-based training (`data.load_features.do=true`).

Usage:
  python -m gluefactory_tpu.scripts.export_local_features \
      --dataset image_folder --method sp \
      dotlist... (e.g. data.images=my_images)
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .. import logger
from ..core.config import Config
from ..datasets import get_dataset
from ..models import get_model
from ..settings import DATA_PATH
from ..utils.export_predictions import export_predictions

# named extractor configs (reference `export_megadepth.py:16-60`)
METHODS = {
    "sp": {
        "name": "superpoint",
        "max_num_keypoints": 2048,
        "detection_threshold": 0.0,
        "nms_radius": 3,
    },
    "sift": {"name": "sift", "max_num_keypoints": 4096},
    "aliked": {"name": "aliked", "max_num_keypoints": 2048},
    "disk": {"name": "disk", "max_num_keypoints": 2048},
}


def sample_depth_callback(pred, data):
    """Attach keypoint depths when the dataset provides dense depth
    (reference `export_megadepth.py` depth sampling)."""
    view = data if "depth" in data else data.get("view0", {})
    if "depth" not in view:
        return pred
    from ..geometry.depth import sample_depth_bilinear

    d, valid = sample_depth_bilinear(
        jnp.asarray(view["depth"]), jnp.asarray(pred["keypoints"])
    )
    return {
        **pred,
        "depth_keypoints": np.asarray(d),
        "valid_depth_keypoints": np.asarray(valid),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="image_folder")
    parser.add_argument("--method", type=str, default="sp")
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--with_depth", action="store_true")
    parser.add_argument("dotlist", nargs="*")
    args = parser.parse_args()

    conf = Config.from_dotlist(args.dotlist)
    data_conf = Config.merge(Config({"name": args.dataset}), conf.get("data", {}))
    dataset = get_dataset(args.dataset)(data_conf)
    loader = dataset.get_data_loader(args.split)

    model_conf = Config.merge(Config(METHODS[args.method]), conf.get("model", {}))
    model = get_model(model_conf["name"]).from_conf(model_conf)

    variables = None
    jitted = {}

    def apply_fn(batch):
        nonlocal variables
        arrays = {
            "image": jnp.asarray(batch["image"]),
        }
        if "image_size" in batch:
            arrays["image_size"] = jnp.asarray(batch["image_size"])
        key = arrays["image"].shape
        if key not in jitted:
            if variables is None:
                variables = model.init(jax.random.PRNGKey(0), arrays)
            jitted[key] = jax.jit(lambda v, d: model.apply(v, d))
        return jitted[key](variables, arrays)

    out = args.output or (
        DATA_PATH / "exports" / f"{args.dataset}-{args.method}.h5"
    )
    export_predictions(
        loader,
        apply_fn,
        Path(out),
        keys=["keypoints", "keypoint_scores", "descriptors"],
        optional_keys=["keypoint_valid", "scales", "oris"],
        callback_fn=sample_depth_callback if args.with_depth else None,
    )
    logger.info(f"exported features to {out}")


if __name__ == "__main__":
    main()
