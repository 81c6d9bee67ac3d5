"""ETH3D match-ranking AP benchmark (reference `gluefactory/eval/eth3d.py:47-202`).

Exports matches, then scores them against depth-based GT labels with
ranking average precision (points, and lines when the model outputs them).
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from tqdm import tqdm

from ..core.config import Config
from ..geometry.gt_generation import gt_matches_from_pose_depth
from ..settings import EVAL_PATH
from .io import get_eval_parser, parse_eval_args
from .megadepth1500 import MegaDepth1500Pipeline
from .utils import AP, get_tp_fp_pts, rescale_pred_to_views

__main_class__ = "ETH3DPipeline"


class ETH3DPipeline(MegaDepth1500Pipeline):
    default_conf = {
        "data": {
            "name": "posed_images",
            "data_dir": "eth3d",
            "views_file": "views.txt",
            "pairs_file": "pairs.txt",
            "depth_dir": "depth",
            "batch_size": 1,
            "test_batch_size": 1,
            "num_workers": 2,
            "preprocessing": {"resize": 1024, "side": "long", "square_pad": True},
        },
        "model": {"name": None, "ground_truth": {"name": None}},
        "eval": {
            "th_positive": 3.0,
            "th_negative": 5.0,
        },
    }

    def run_eval(self, loader, pred_file):
        import h5py

        conf = Config(self.conf.eval)
        results = defaultdict(list)
        all_tp, all_scores, total_gt = [], [], 0

        with h5py.File(str(pred_file), "r") as hfile:
            for data in tqdm(loader, desc="eth3d eval"):
                from ..utils.tensor import map_tensor

                data = map_tensor(
                    data,
                    lambda t: np.asarray(t)[0] if hasattr(t, "ndim") and t.ndim > 0 else t,
                )
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

                gt = gt_matches_from_pose_depth(
                    jnp.asarray(pred["keypoints0"])[None],
                    jnp.asarray(pred["keypoints1"])[None],
                    jnp.asarray(data["view0"]["depth"])[None],
                    jnp.asarray(data["view1"]["depth"])[None],
                    data["view0"]["camera"],
                    data["view1"]["camera"],
                    data["T_0to1"],
                    valid0=jnp.asarray(pred.get("keypoint_valid0", np.ones(len(pred["keypoints0"]), bool)))[None],
                    valid1=jnp.asarray(pred.get("keypoint_valid1", np.ones(len(pred["keypoints1"]), bool)))[None],
                    pos_th=conf.th_positive,
                    neg_th=conf.th_negative,
                )
                gt0 = np.asarray(gt["gt_matches0"][0])
                tp, scores, n_gt = get_tp_fp_pts(
                    pred["matches0"], gt0, pred["matching_scores0"]
                )
                all_tp.append(tp)
                all_scores.append(scores)
                total_gt += n_gt
                results["num_matches"].append(int((pred["matches0"] >= 0).sum()))
                results["num_gt"].append(int(n_gt))
                results["names"].append(str(name))

        tp = np.concatenate(all_tp) if all_tp else np.zeros(0, bool)
        scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
        order = np.argsort(-scores)
        ap = AP(tp[order], total_gt) * 100
        summaries = {
            "match_AP": float(ap),
            "mnum_matches": float(np.mean(results["num_matches"])) if results["num_matches"] else 0.0,
        }
        return summaries, {}, dict(results)


if __name__ == "__main__":
    dataset_name = Path(__file__).stem
    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    default_conf = Config(ETH3DPipeline.default_conf)
    configs_path = Path(__file__).parent.parent / "configs"
    name, conf = parse_eval_args(dataset_name, args, configs_path, default_conf)
    experiment_dir = EVAL_PATH / dataset_name / name
    experiment_dir.mkdir(exist_ok=True, parents=True)
    s, f, r = ETH3DPipeline(conf).run(
        experiment_dir, overwrite=args.overwrite, overwrite_eval=args.overwrite_eval
    )
    from pprint import pprint

    pprint(s)
