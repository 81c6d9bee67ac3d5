"""EvalPipeline: cache-then-evaluate benchmark harness
(reference `gluefactory/eval/eval_pipeline.py:53-117`; protocol doc
`docs/evaluation.md:3-6`).

Loop 1 exports device predictions to `predictions.h5`; Loop 2 evaluates the
cached predictions (RANSAC sweeps etc.). Conf drift between runs of the same
experiment dir is detected and requires `overwrite` (reference `:102-117`).
"""

from __future__ import annotations

import json
from pathlib import Path

import h5py
import numpy as np

from .. import logger
from ..core.config import Config


def load_eval(dir_: Path):
    summaries, results = {}, {}
    with h5py.File(str(dir_ / "results.h5"), "r") as hfile:
        for k in hfile.keys():
            r = np.array(hfile[k])
            if len(r.shape) < 3:
                results[k] = r
        for k, v in hfile.attrs.items():
            summaries[k] = v
    with open(dir_ / "summaries.json", "r") as f:
        s = json.load(f)
    summaries = {k: v if v is not None else np.nan for k, v in s.items()}
    return summaries, results


def save_eval(dir_: Path, summaries: dict, figures: dict, results: dict):
    with h5py.File(str(dir_ / "results.h5"), "w") as hfile:
        for k, v in results.items():
            arr = np.array(v)
            if not np.issubdtype(arr.dtype, np.number):
                arr = arr.astype("object")
                hfile.create_dataset(k, data=arr, dtype=h5py.string_dtype())
            else:
                hfile.create_dataset(k, data=arr)
        for k, v in summaries.items():
            if isinstance(v, (int, float, np.number)) and v is not None:
                hfile.attrs[k] = v
    s = {
        k: (float(v) if isinstance(v, (int, float, np.number)) and np.isfinite(v) else v)
        for k, v in summaries.items()
    }
    with open(dir_ / "summaries.json", "w") as f:
        json.dump(s, f, indent=4, default=str)
    for fig_name, fig in figures.items():
        fig.savefig(dir_ / f"{fig_name}.png")


def exists_eval(dir_: Path):
    return (dir_ / "results.h5").exists() and (dir_ / "summaries.json").exists()


def export_stage_timings(model, variables, loader, experiment_dir, reps=10):
    """Per-stage timing/memory export (reference fork `_profile_call`,
    `two_view_pipeline.py:360-404` + `eval/hpatches.py:30-43`).

    The fork times every pair on CUDA; with XLA's static shapes one measured
    batch is representative, so Loop 1 measures the jitted extractor / full
    pipeline once (reps-amortized) and writes `timings.json` with the fork's
    key names (extractor_time_ms, matcher_time_ms, total_time_ms,
    forward_allocated_memory_mb, pair_resolution). `run()` merges the keys
    into summaries.json.
    """
    import jax

    try:
        from ..utils.profiling import time_pipeline_stages

        if not hasattr(model, "extract_view"):
            return None
        data = next(iter(loader))

        def strip(d):
            if isinstance(d, dict):
                return {
                    k: strip(v)
                    for k, v in d.items()
                    if isinstance(v, dict) or hasattr(v, "ndim")
                }
            return d

        import jax.numpy as jnp

        clean = jax.tree.map(lambda t: jnp.asarray(t), strip(data))
        if variables is None:
            variables = model.init(jax.random.PRNGKey(0), clean)
        t = time_pipeline_stages(model, variables, clean, reps=reps)
        with open(Path(experiment_dir) / "timings.json", "w") as f:
            json.dump({k: float(v) for k, v in t.items()}, f, indent=2)
        logger.info(f"stage timings: {t}")
        return t
    except Exception as e:  # timing must never fail an eval run
        logger.warning(f"stage timing export failed: {e}")
        return None


class EvalPipeline:
    default_conf = {}
    export_keys = []
    optional_export_keys = []

    def __init__(self, conf):
        """Assumes conf has model/data/eval keys."""
        base = Config(self.default_conf)
        self.default_conf = base
        self.conf = Config.merge(base, conf or {})
        self._init(self.conf)

    def _init(self, conf):
        pass

    @classmethod
    def get_dataloader(cls, data_conf=None):
        raise NotImplementedError

    def get_predictions(self, experiment_dir, model=None, overwrite=False):
        """Loop 1 (reference `eval_pipeline.py:81-88`)."""
        raise NotImplementedError

    def run_eval(self, loader, pred_file):
        """Loop 2."""
        raise NotImplementedError

    def run(self, experiment_dir: Path, model=None, overwrite=False, overwrite_eval=False):
        experiment_dir = Path(experiment_dir)
        experiment_dir.mkdir(exist_ok=True, parents=True)
        self.save_conf(
            experiment_dir, overwrite=overwrite, overwrite_eval=overwrite_eval
        )
        pred_file = self.get_predictions(
            experiment_dir, model=model, overwrite=overwrite
        )
        f = {}
        if not exists_eval(experiment_dir) or overwrite_eval or overwrite:
            s, f, r = self.run_eval(self.get_dataloader(self.conf.get("data")), pred_file)
            # fork parity: per-stage timing keys flow into the summaries
            # (reference `eval/hpatches.py:30-43,135-143`)
            timing_file = experiment_dir / "timings.json"
            if timing_file.exists():
                with open(timing_file) as tf:
                    for k, v in json.load(tf).items():
                        s.setdefault(f"m{k}", float(v))
            save_eval(experiment_dir, s, f, r)
        s, r = load_eval(experiment_dir)
        return s, f, r

    def save_conf(self, experiment_dir: Path, overwrite=False, overwrite_eval=False):
        """Conf persistence + drift check (reference `eval_pipeline.py:102-117`)."""
        conf_output_path = experiment_dir / "conf.yaml"
        if conf_output_path.exists():
            saved_conf = Config.load(conf_output_path)
            if Config(saved_conf.get("data", {})) != Config(self.conf.get("data", {})) or Config(
                saved_conf.get("model", {})
            ) != Config(self.conf.get("model", {})):
                assert overwrite, (
                    "configs changed, add --overwrite to rerun experiment "
                    "with new configs"
                )
            if Config(saved_conf.get("eval", {})) != Config(self.conf.get("eval", {})):
                assert overwrite or overwrite_eval, (
                    "eval configs changed, add --overwrite_eval to rerun evaluation"
                )
        self.conf.save(conf_output_path)
