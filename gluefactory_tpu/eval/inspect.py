"""Interactive benchmark inspector
(reference `gluefactory/eval/inspect.py:1-61` + `visualization/global_frame.py:17`
+ `two_view_frame.py:21`).

Loads one or more benchmark runs, shows a scatter of per-pair metrics; click
a point to open the two-view match visualization for that pair.

  python -m gluefactory_tpu.eval.inspect <benchmark> <run_name> [run2 ...] \
      [--x metric_x] [--y metric_y]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from ..settings import DATA_PATH, EVAL_PATH
from .eval_pipeline import load_eval


def load_runs(benchmark: str, names):
    runs = {}
    for name in names:
        d = EVAL_PATH / benchmark / name
        if not d.exists():
            raise FileNotFoundError(d)
        summaries, results = load_eval(d)
        runs[name] = {"dir": d, "summaries": summaries, "results": results}
    return runs


class GlobalFrame:
    """Scatter of per-pair metrics; click -> TwoViewFrame."""

    def __init__(self, runs: dict, x_metric: str, y_metric: str, benchmark: str):
        import matplotlib

        matplotlib.use("TkAgg" if matplotlib.get_backend() != "Agg" else "Agg")
        import matplotlib.pyplot as plt

        self.runs = runs
        self.benchmark = benchmark
        self.fig, self.ax = plt.subplots(figsize=(8, 6))
        self.names = None
        for run, payload in runs.items():
            res = payload["results"]
            if x_metric not in res or y_metric not in res:
                continue
            x = np.asarray(res[x_metric], float)
            y = np.asarray(res[y_metric], float)
            sc = self.ax.scatter(x, y, s=12, alpha=0.6, label=run, picker=5)
            sc.run_name = run
            if self.names is None and "names" in res:
                self.names = [
                    n.decode() if isinstance(n, bytes) else str(n)
                    for n in res["names"]
                ]
        self.ax.set_xlabel(x_metric)
        self.ax.set_ylabel(y_metric)
        self.ax.legend()
        self.fig.canvas.mpl_connect("pick_event", self.on_pick)

    def on_pick(self, event):
        idx = int(event.ind[0])
        run = getattr(event.artist, "run_name", None)
        if run is None or self.names is None:
            return
        TwoViewFrame(self.runs[run], self.names[idx], self.benchmark)

    def show(self):
        import matplotlib.pyplot as plt

        plt.show()


class TwoViewFrame:
    """Match visualization of one pair from the cached predictions."""

    def __init__(self, run: dict, name: str, benchmark: str, plot: str = "matches"):
        import h5py

        from ..visualization.tools import __plot_dict__
        from ..visualization.viz2d import plot_images

        pred_file = run["dir"] / "predictions.h5"
        with h5py.File(str(pred_file), "r") as f:
            if name not in f:
                print(f"pair {name} not in predictions")
                return
            pred = {k: v.__array__()[None] for k, v in f[name].items()}
        imgs = self._load_images(name, benchmark)
        if imgs is None:
            print(f"images for {name} not found under {DATA_PATH}")
            return
        fig, axs = plot_images(list(imgs), titles=[f"{name} [{plot}]", ""])
        # any registered plot from visualization/tools.py (reference
        # `tools.py:582-600` keyboard-toggle registry)
        plot_cls = __plot_dict__.get(plot, __plot_dict__["matches"])
        data = {
            "view0": {"image": imgs[0][None]},
            "view1": {"image": imgs[1][None]},
        }
        plot_cls()(pred, data, 0, axs)
        fig.show()

    def _load_images(self, name: str, benchmark: str):
        import cv2

        if benchmark == "hpatches":
            seq, img = name.split("/")
            root = DATA_PATH / "hpatches-sequences-release" / seq
            i0 = cv2.imread(str(root / "1.ppm"))
            i1 = cv2.imread(str(root / img))
            if i0 is None or i1 is None:
                return None
            return cv2.cvtColor(i0, cv2.COLOR_BGR2RGB), cv2.cvtColor(i1, cv2.COLOR_BGR2RGB)
        return None


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("benchmark", type=str)
    parser.add_argument("runs", nargs="+")
    parser.add_argument("--x", type=str, default="num_matches")
    parser.add_argument("--y", type=str, default="prec@3px")
    args = parser.parse_args()
    runs = load_runs(args.benchmark, args.runs)
    frame = GlobalFrame(runs, args.x, args.y, args.benchmark)
    frame.show()
