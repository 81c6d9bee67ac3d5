"""HPatches homography benchmark (reference `gluefactory/eval/hpatches.py:29-230`).

Loop 1 exports matches for all 580 pairs; Loop 2 computes match precision,
weighted-DLT homography error, and a RANSAC threshold sweep -> H-AUC@1/3/5px.
The RANSAC sweep runs on the *device* estimator by default (all thresholds
re-use the same jit; SURVEY.md §7.1-5).
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from .. import logger
from ..core.config import Config
from ..datasets import get_dataset
from ..models import get_model
from ..settings import EVAL_PATH
from ..utils.export_predictions import export_predictions
from ..utils.tensor import map_tensor
from ..utils.tools import AUCMetric
from .eval_pipeline import EvalPipeline
from .io import get_eval_parser, load_model, parse_eval_args
from .utils import (
    rescale_pred_to_views,
    eval_homography_dlt,
    eval_homography_robust,
    eval_matches_homography,
)

__main_class__ = "HPatchesPipeline"


class HPatchesPipeline(EvalPipeline):
    default_conf = {
        "data": {
            "name": "hpatches",
            "batch_size": 1,
            "test_batch_size": 1,
            "num_workers": 2,
            "preprocessing": {"resize": 480, "side": "short", "square_pad": True},
        },
        "model": {
            "name": None,
            "ground_truth": {"name": None},
        },
        "eval": {
            "estimator": "device_lo_ransac",
            "ransac_th": -1,  # -1 -> threshold sweep
            "auc_ths": [1, 3, 5],
        },
    }

    export_keys = [
        "keypoints0",
        "keypoints1",
        "keypoint_scores0",
        "keypoint_scores1",
        "matches0",
        "matches1",
        "matching_scores0",
        "matching_scores1",
    ]
    optional_export_keys = ["keypoint_valid0", "keypoint_valid1"]

    @classmethod
    def get_dataloader(cls, data_conf=None):
        data_conf = Config.merge(
            Config(cls.default_conf["data"]), data_conf or {}
        )
        dataset = get_dataset("hpatches")(data_conf)
        return dataset.get_data_loader("test")

    def get_predictions(self, experiment_dir, model=None, overwrite=False):
        pred_file = Path(experiment_dir) / "predictions.h5"
        if pred_file.exists() and not overwrite:
            return pred_file
        if model is None:
            model, variables = load_model(
                Config(self.conf.model), self.conf.model.get("checkpoint")
            )
        else:
            model, variables = model
        loader = self.get_dataloader(self.conf.data)

        apply_fn = make_batched_apply(model, variables)
        export_predictions(
            loader,
            apply_fn,
            pred_file,
            as_half=False,
            keys=self.export_keys,
            optional_keys=self.optional_export_keys,
        )
        from .eval_pipeline import export_stage_timings

        export_stage_timings(
            model, variables, self.get_dataloader(self.conf.data), experiment_dir
        )
        return pred_file

    def run_eval(self, loader, pred_file):
        import h5py

        conf = Config(self.conf.eval)
        results = defaultdict(list)
        test_thresholds = (
            [0.5, 1.0, 1.5, 2.0, 2.5, 3.0]
            if conf.ransac_th == -1
            else [conf.ransac_th]
        )
        pose_results = {th: defaultdict(list) for th in test_thresholds}

        with h5py.File(str(pred_file), "r") as hfile:
            for data in tqdm(loader, desc="hpatches eval"):
                data = map_tensor(data, lambda t: np.asarray(t)[0] if hasattr(t, "ndim") and t.ndim > 0 else t)
                name = data["name"]
                if isinstance(name, list):
                    name = name[0]
                pred = {k: v.__array__() for k, v in hfile[str(name)].items()}
                pred = rescale_pred_to_views(pred, data)
                results_i = eval_matches_homography(data, pred)
                results_i.update(eval_homography_dlt(data, pred))
                for th in test_thresholds:
                    est_conf = Config(
                        {"estimator": conf.estimator, "ransac_th": float(th)}
                    )
                    pose_results_i = eval_homography_robust(data, pred, est_conf)
                    for k, v in pose_results_i.items():
                        pose_results[th][k].append(v)
                for k, v in results_i.items():
                    results[k].append(v)
                results["names"].append(str(name))

        summaries = {}
        for k, v in results.items():
            if k != "names" and np.issubdtype(np.asarray(v).dtype, np.number):
                arr = np.asarray(v, np.float64)
                summaries[f"m{k}"] = float(np.round(np.nanmean(arr[np.isfinite(arr)]), 3)) if np.isfinite(arr).any() else float("nan")

        # DLT AUC
        auc_ths = list(conf.auc_ths)
        dlt_aucs = AUCMetric(auc_ths, np.asarray(results["H_error_dlt"])).compute()
        for th, auc in zip(auc_ths, dlt_aucs):
            summaries[f"H_error_dlt@{th}px"] = float(auc)

        # RANSAC sweep: best threshold by mAA
        best_mAA = -1.0
        for th, res in pose_results.items():
            errs = np.asarray(res["H_error_ransac"], np.float64)
            aucs = AUCMetric(auc_ths, errs).compute()
            mAA = float(np.mean(aucs))
            if mAA > best_mAA:
                best_mAA = mAA
                for t, auc in zip(auc_ths, aucs):
                    summaries[f"H_error_ransac@{t}px"] = float(auc)
                summaries["H_error_ransac_mAA"] = mAA
                summaries["best_ransac_th"] = th
                results["H_error_ransac"] = res["H_error_ransac"]
                summaries["mransac_inl"] = float(np.mean(res["ransac_inl"]))
                summaries["mransac_inl%"] = float(np.mean(res["ransac_inl%"]))

        figures = {}
        return summaries, figures, dict(results)


def make_batched_apply(model, variables):
    """Jitted full-pipeline forward for export (init if untrained)."""
    jitted = {}

    def apply_fn(data):
        arrays = map_tensor(
            data, lambda t: jnp.asarray(t) if hasattr(t, "ndim") else t
        )
        # drop non-array leaves for the jit boundary
        clean = _strip_nonarrays(arrays)
        shape_key = _shapes_key(clean)
        if shape_key not in jitted:
            nonlocal variables
            if variables is None:
                variables = model.init(jax.random.PRNGKey(0), clean)
                logger.warning("model has no trained weights; using random init")
            jitted[shape_key] = jax.jit(lambda v, d: model.apply(v, d))
        return jitted[shape_key](variables, clean)

    return apply_fn


def _strip_nonarrays(d):
    if isinstance(d, dict):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = _strip_nonarrays(v)
            elif hasattr(v, "ndim"):
                out[k] = v
        return out
    return d


def _shapes_key(d):
    if isinstance(d, dict):
        return tuple(sorted((k, _shapes_key(v)) for k, v in d.items()))
    return tuple(d.shape)


if __name__ == "__main__":
    dataset_name = Path(__file__).stem
    parser = get_eval_parser()
    args = parser.parse_intermixed_args()

    default_conf = Config(HPatchesPipeline.default_conf)
    configs_path = Path(__file__).parent.parent / "configs"
    name, conf = parse_eval_args(dataset_name, args, configs_path, default_conf)

    experiment_dir = EVAL_PATH / "hpatches" / name
    experiment_dir.mkdir(exist_ok=True, parents=True)

    pipeline = HPatchesPipeline(conf)
    s, f, r = pipeline.run(
        experiment_dir, overwrite=args.overwrite, overwrite_eval=args.overwrite_eval
    )
    from pprint import pprint

    pprint(s)
