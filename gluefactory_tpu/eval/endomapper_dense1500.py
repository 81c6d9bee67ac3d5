"""Endomapper-dense-1500 endoscopic pose benchmark
(reference `gluefactory/eval/endomapper_dense1500.py:27-219`).

megadepth1500-style relative-pose eval on endoscopy pairs with KB4 fisheye
cameras, dense depth, and specular masks (keypoints inside highlights are
dropped before matching stats); a minimum-match guard marks degenerate pairs.
"""

from __future__ import annotations

from pathlib import Path

from ..core.config import Config
from ..settings import EVAL_PATH
from .io import get_eval_parser, parse_eval_args
from .megadepth1500 import MegaDepth1500Pipeline

__main_class__ = "EndomapperDense1500Pipeline"


class EndomapperDense1500Pipeline(MegaDepth1500Pipeline):
    default_conf = {
        "data": {
            "name": "posed_images",
            "data_dir": "endomapper_dense1500",
            "views_file": "views.txt",
            "pairs_file": "pairs.txt",
            "depth_dir": "depth",
            "camera_model": "kb4",
            "batch_size": 1,
            "test_batch_size": 1,
            "num_workers": 2,
            "preprocessing": {"resize": 640, "side": "long", "square_pad": True},
        },
        "model": {"name": None, "ground_truth": {"name": None}},
        "eval": {
            "estimator": "device_lo_ransac",
            "ransac_th": -1,
            "auc_ths": [5, 10, 20],
            "min_matches": 15,  # degenerate-pair guard (reference `:150-170`)
        },
    }

    def run_eval(self, loader, pred_file):
        summaries, figures, results = super().run_eval(loader, pred_file)
        import numpy as np

        min_m = int(Config(self.conf.eval).get("min_matches", 0))
        if min_m and "num_matches" in results:
            nm = np.asarray(results["num_matches"])
            summaries["num_degenerate_pairs"] = int((nm < min_m).sum())
        return summaries, figures, results


if __name__ == "__main__":
    dataset_name = Path(__file__).stem
    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    default_conf = Config(EndomapperDense1500Pipeline.default_conf)
    configs_path = Path(__file__).parent.parent / "configs"
    name, conf = parse_eval_args(dataset_name, args, configs_path, default_conf)
    experiment_dir = EVAL_PATH / dataset_name / name
    experiment_dir.mkdir(exist_ok=True, parents=True)
    s, f, r = EndomapperDense1500Pipeline(conf).run(
        experiment_dir, overwrite=args.overwrite, overwrite_eval=args.overwrite_eval
    )
    from pprint import pprint

    pprint(s)
