"""ZEB zero-shot pose benchmark (reference `gluefactory/eval/zeb.py:14-93`):
the scannet1500 protocol over the 12 cross-domain ZEB subsets, reporting the
mean pose AUC across subsets.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..core.config import Config
from ..settings import EVAL_PATH
from .io import get_eval_parser, parse_eval_args
from .scannet1500 import ScanNet1500Pipeline

__main_class__ = "ZEBPipeline"


class ZEBPipeline(ScanNet1500Pipeline):
    default_conf = {
        "data": {
            # native ZEB layout (per-pair txt files, `datasets/zeb.py`);
            # set name: posed_images to keep the generic views/pairs route
            "name": "zeb",
            "root": "zeb",
            "batch_size": 1,
            "test_batch_size": 1,
            "num_workers": 2,
            "preprocessing": {"resize": 640, "side": "long", "square_pad": True},
        },
        "model": {"name": None, "ground_truth": {"name": None}},
        "eval": {
            "estimator": "device_lo_ransac",
            "ransac_th": 3.0,
            "auc_ths": [5, 10, 20],
        },
    }

    def run_eval(self, loader, pred_file):
        summaries, figures, results = super().run_eval(loader, pred_file)
        # per-subset breakdown: names are "<subset>/..." when present
        names = results.get("names", [])
        subsets = sorted({n.split("/")[0] for n in names if "/" in n})
        if subsets and "rel_pose_error" in results:
            from ..utils.tools import AUCMetric

            errs = np.asarray(results["rel_pose_error"], np.float64)
            per = {}
            for sub in subsets:
                mask = np.asarray([n.startswith(sub + "/") for n in names])
                aucs = AUCMetric([5, 10, 20], errs[mask]).compute()
                per[sub] = float(np.mean(aucs))
                summaries[f"mAA_{sub}"] = per[sub]
            summaries["mAA_mean_subsets"] = float(np.mean(list(per.values())))
        return summaries, figures, results


if __name__ == "__main__":
    dataset_name = Path(__file__).stem
    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    default_conf = Config(ZEBPipeline.default_conf)
    configs_path = Path(__file__).parent.parent / "configs"
    name, conf = parse_eval_args(dataset_name, args, configs_path, default_conf)
    experiment_dir = EVAL_PATH / dataset_name / name
    experiment_dir.mkdir(exist_ok=True, parents=True)
    s, f, r = ZEBPipeline(conf).run(
        experiment_dir, overwrite=args.overwrite, overwrite_eval=args.overwrite_eval
    )
    from pprint import pprint

    pprint(s)
