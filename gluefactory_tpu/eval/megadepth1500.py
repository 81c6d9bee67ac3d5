"""MegaDepth-1500 relative-pose benchmark
(reference `gluefactory/eval/megadepth1500.py:31-224`).

Loop 1 exports matches; Loop 2 computes epipolar precision, depth-reprojection
precision, and a relative-pose RANSAC sweep -> pose AUC@5/10/20°.
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import numpy as np
from tqdm import tqdm

from ..core.config import Config
from ..datasets import get_dataset
from ..settings import EVAL_PATH
from ..utils.export_predictions import export_predictions
from ..utils.tensor import map_tensor
from .eval_pipeline import EvalPipeline
from .hpatches import make_batched_apply
from .io import get_eval_parser, load_model, parse_eval_args
from .utils import (
    rescale_pred_to_views,
    eval_matches_depth,
    eval_matches_epipolar,
    eval_poses,
    eval_relative_pose_robust,
)

__main_class__ = "MegaDepth1500Pipeline"


class MegaDepth1500Pipeline(EvalPipeline):
    default_conf = {
        "data": {
            "name": "posed_images",
            "data_dir": "megadepth1500",
            "views_file": "views.txt",
            "pairs_file": "pairs.txt",
            "depth_dir": "depth",
            "batch_size": 1,
            "test_batch_size": 1,
            "num_workers": 2,
            "preprocessing": {"resize": 1600, "side": "long", "square_pad": True},
        },
        "model": {"name": None, "ground_truth": {"name": None}},
        "eval": {
            "estimator": "device_lo_ransac",
            "ransac_th": -1,
            "auc_ths": [5, 10, 20],
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
        data_conf = Config.merge(Config(cls.default_conf["data"]), data_conf or {})
        dataset = get_dataset(data_conf["name"])(data_conf)
        return dataset.get_data_loader("test")

    def get_predictions(self, experiment_dir, model=None, overwrite=False):
        pred_file = Path(experiment_dir) / "predictions.h5"
        if pred_file.exists() and not overwrite:
            return pred_file
        if model is None:
            model = load_model(
                Config(self.conf.model), self.conf.model.get("checkpoint")
            )
        apply_fn = make_batched_apply(model[0], model[1])
        export_predictions(
            self.get_dataloader(self.conf.data),
            apply_fn,
            pred_file,
            keys=self.export_keys,
            optional_keys=self.optional_export_keys,
        )
        from .eval_pipeline import export_stage_timings

        export_stage_timings(
            model[0], model[1], self.get_dataloader(self.conf.data), experiment_dir
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
            for data in tqdm(loader, desc="pose eval"):
                data = map_tensor(
                    data,
                    lambda t: np.asarray(t)[0] if hasattr(t, "ndim") and t.ndim > 0 else t,
                )
                # pytree fields (camera/pose) also need de-batching
                import jax

                for vk in ("view0", "view1"):
                    if "camera" in data[vk]:
                        data[vk]["camera"] = jax.tree.map(
                            lambda x: x[0] if hasattr(x, "ndim") and x.ndim > 0 else x,
                            data[vk]["camera"],
                        )
                data["T_0to1"] = jax.tree.map(
                    lambda x: x[0] if hasattr(x, "ndim") and x.ndim > 0 else x,
                    data["T_0to1"],
                )
                name = data["name"]
                if isinstance(name, list):
                    name = name[0]
                pred = {k: v.__array__() for k, v in hfile[str(name)].items()}
                pred = rescale_pred_to_views(pred, data)
                results_i = eval_matches_epipolar(data, pred)
                if "depth" in data["view0"]:
                    results_i.update(eval_matches_depth(data, pred))
                for th in test_thresholds:
                    est_conf = Config(
                        {"estimator": conf.estimator, "ransac_th": float(th)}
                    )
                    pr = eval_relative_pose_robust(data, pred, est_conf)
                    for k, v in pr.items():
                        pose_results[th][k].append(v)
                for k, v in results_i.items():
                    results[k].append(v)
                results["names"].append(str(name))

        summaries = {}
        for k, v in results.items():
            if k != "names" and np.issubdtype(np.asarray(v).dtype, np.number):
                arr = np.asarray(v, np.float64)
                ok = np.isfinite(arr)
                summaries[f"m{k}"] = (
                    float(np.round(np.mean(arr[ok]), 3)) if ok.any() else float("nan")
                )
        summaries.update(
            eval_poses(pose_results, auc_ths=list(conf.auc_ths), key="rel_pose_error")
        )
        # per-pair pose errors at the winning threshold, for subset
        # breakdowns (eval/zeb.py) and the per-pair inspector
        best_th = summaries.get("best_ransac_th")
        if best_th in pose_results:
            results["rel_pose_error"] = list(
                pose_results[best_th]["rel_pose_error"]
            )
        return summaries, {}, dict(results)


if __name__ == "__main__":
    dataset_name = Path(__file__).stem
    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    default_conf = Config(MegaDepth1500Pipeline.default_conf)
    configs_path = Path(__file__).parent.parent / "configs"
    name, conf = parse_eval_args(dataset_name, args, configs_path, default_conf)
    experiment_dir = EVAL_PATH / dataset_name / name
    experiment_dir.mkdir(exist_ok=True, parents=True)
    pipeline = MegaDepth1500Pipeline(conf)
    s, f, r = pipeline.run(
        experiment_dir, overwrite=args.overwrite, overwrite_eval=args.overwrite_eval
    )
    from pprint import pprint

    pprint(s)
