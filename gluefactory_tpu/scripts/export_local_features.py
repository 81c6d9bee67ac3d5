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


def _load_depth_file(path: Path) -> np.ndarray | None:
    try:
        sp = str(path)
        if sp.endswith(".h5") or sp.endswith(".hdf5"):
            import h5py

            with h5py.File(sp, "r") as f:
                key = "depth" if "depth" in f else list(f.keys())[0]
                return f[key].__array__().astype(np.float32)
        if sp.endswith(".npz"):
            with np.load(sp) as d:
                depth = d["depth"].astype(np.float32)
                if "mask" in d:
                    depth = np.where(d["mask"].astype(bool), depth, 0.0)
                return depth
        return np.load(sp).astype(np.float32)
    except Exception as e:  # pragma: no cover - corrupt files
        logger.warning(f"cannot read depth {path}: {e}")
        return None


def run_image_export(items, model_conf, output: Path, resize=1024, with_depth=False):
    """Shared image-list export core used by the per-dataset exporters
    (`export_megadepth.py`, `export_endomapper_dense.py`).

    items: iterable of (key, image_path, depth_path|None). Extracts with a
    shape-bucketed jit, optionally samples keypoint depths from the depth
    file (reference `export_megadepth.py:137-177` sample_depth), writes
    `keypoints/keypoint_scores/descriptors[/depth_keypoints]` per key.
    """
    import h5py

    from ..geometry.depth import sample_depth_bilinear
    from ..utils.image import ImagePreprocessor, read_image

    model = get_model(model_conf["name"]).from_conf(dict(model_conf))
    pre = ImagePreprocessor({"resize": resize, "side": "long", "square_pad": False})
    variables = None
    jitted = {}
    output.parent.mkdir(parents=True, exist_ok=True)
    n = 0
    with h5py.File(str(output), "w") as out_f:
        for key, img_path, depth_path in items:
            img = read_image(img_path, False)
            out = pre(img)
            arrays = {
                "image": jnp.asarray(out["image"])[None],
                "image_size": jnp.asarray(out["image_size"], jnp.float32)[None],
            }
            shape = arrays["image"].shape
            if shape not in jitted:
                if variables is None:
                    variables = model.init(jax.random.PRNGKey(0), arrays)
                jitted[shape] = jax.jit(lambda v, d: model.apply(v, d))
            pred = jitted[shape](variables, arrays)
            kpts = np.asarray(pred["keypoints"][0])
            # keypoints back in original-image pixels (de-scale)
            scales = np.asarray(out["scales"], np.float32)
            rec = {
                "keypoints": (kpts / scales).astype(np.float32),
                "keypoint_scores": np.asarray(pred["keypoint_scores"][0]),
                "descriptors": np.asarray(pred["descriptors"][0]),
                "keypoint_valid": np.asarray(pred["keypoint_valid"][0]),
            }
            if with_depth and depth_path is not None:
                depth = _load_depth_file(depth_path)
                if depth is not None:
                    d, valid = sample_depth_bilinear(
                        jnp.asarray(depth)[None], jnp.asarray(rec["keypoints"])[None]
                    )
                    rec["depth_keypoints"] = np.asarray(d[0], np.float32)
                    rec["valid_depth_keypoints"] = np.asarray(valid[0])
            grp = out_f.create_group(key)
            for k, v in rec.items():
                grp.create_dataset(k, data=v)
            n += 1
    return n


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
