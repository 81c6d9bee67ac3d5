"""Batched prediction export to HDF5
(reference `gluefactory/utils/export_predictions.py:22-91`).

Loop 1 of the eval protocol: run the (jitted) model over a loader and cache
per-item predictions. Keypoints are de-scaled back to original image coords
when the dataset resized (reference `:55-73`).
"""

from __future__ import annotations

from pathlib import Path

import h5py
import jax
import numpy as np

from .. import logger
from .tensor import index_batch


def export_predictions(
    loader,
    model_apply,  # fn(data) -> pred (jitted outside)
    output_file: Path,
    as_half: bool = False,
    keys: str | list = "*",
    callback_fn=None,
    optional_keys: list = (),
):
    assert keys == "*" or isinstance(keys, (list, tuple))
    output_file = Path(output_file)
    output_file.parent.mkdir(exist_ok=True, parents=True)
    with h5py.File(str(output_file), "w") as hfile:
        for data in loader:
            pred = model_apply(data)
            pred = jax.device_get(pred)
            if callback_fn is not None:
                pred = {**callback_fn(pred, data), **pred}
            if keys != "*":
                if len(set(keys) - set(pred.keys())) > 0:
                    raise ValueError(f"missing key {set(keys) - set(pred.keys())}")
                pred = {
                    k: v
                    for k, v in pred.items()
                    if k in keys + list(optional_keys)
                }
            # de-scale keypoints to original image coordinates
            # (reference `export_predictions.py:55-73`: suffixed keys use the
            # matching view's scales, unsuffixed single-view exports the
            # top-level scales)
            for idx, (d_item, p_item) in enumerate(
                zip(index_batch(data), index_batch(pred))
            ):
                def descale(key, scales, line=False):
                    s = np.asarray(scales)
                    if key in p_item:
                        arr = np.asarray(p_item[key])
                        p_item[key] = (arr + 0.5) / (s[None] if line else s) - 0.5

                for i in ("0", "1"):
                    view = d_item.get(f"view{i}", {})
                    scales = view.get("scales") if isinstance(view, dict) else None
                    if scales is not None:
                        descale(f"keypoints{i}", scales)
                        descale(f"lines{i}", scales, line=True)
                if d_item.get("scales") is not None:
                    descale("keypoints", d_item["scales"])
                    descale("lines", d_item["scales"], line=True)
                # string leaves survive index_batch as the full per-batch
                # list; pick this item's entry
                name = d_item["name"]
                if isinstance(name, (list, tuple)):
                    name = name[idx]
                try:
                    grp = hfile.create_group(str(name))
                except ValueError:
                    logger.warning(f"duplicate item name {name}; overwriting")
                    del hfile[str(name)]
                    grp = hfile.create_group(str(name))
                for k, v in p_item.items():
                    arr = np.asarray(v)
                    if as_half and arr.dtype == np.float32:
                        arr = arr.astype(np.float16)
                    grp.create_dataset(k, data=arr)
    return output_file
