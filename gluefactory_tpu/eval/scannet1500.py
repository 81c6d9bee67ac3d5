"""ScanNet-1500 relative-pose benchmark
(reference `gluefactory/eval/scannet1500.py:26-193`): same protocol as
megadepth1500 on indoor posed pairs.
"""

from __future__ import annotations

from pathlib import Path

from ..core.config import Config
from ..settings import EVAL_PATH
from .io import get_eval_parser, parse_eval_args
from .megadepth1500 import MegaDepth1500Pipeline

__main_class__ = "ScanNet1500Pipeline"


class ScanNet1500Pipeline(MegaDepth1500Pipeline):
    default_conf = {
        "data": {
            "name": "posed_images",
            "data_dir": "scannet1500",
            "views_file": "views.txt",
            "pairs_file": "pairs.txt",
            "depth_dir": None,
            "depth_scale": 0.001,  # ScanNet depth png are mm
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
        },
    }


if __name__ == "__main__":
    dataset_name = Path(__file__).stem
    parser = get_eval_parser()
    args = parser.parse_intermixed_args()
    default_conf = Config(ScanNet1500Pipeline.default_conf)
    configs_path = Path(__file__).parent.parent / "configs"
    name, conf = parse_eval_args(dataset_name, args, configs_path, default_conf)
    experiment_dir = EVAL_PATH / dataset_name / name
    experiment_dir.mkdir(exist_ok=True, parents=True)
    s, f, r = ScanNet1500Pipeline(conf).run(
        experiment_dir, overwrite=args.overwrite, overwrite_eval=args.overwrite_eval
    )
    from pprint import pprint

    pprint(s)
