"""Benchmark registry (reference `gluefactory/eval/__init__.py:8-24`)."""

from ..core.registry import resolve_class
from .eval_pipeline import EvalPipeline


def get_benchmark(benchmark: str) -> type:
    return resolve_class(benchmark, __name__, EvalPipeline)


def run_benchmark(benchmark: str, eval_conf, experiment_dir, model=None):
    """One-call benchmark run, overwriting previous results
    (reference `eval/__init__.py:13-24`)."""
    from pathlib import Path

    experiment_dir = Path(experiment_dir)
    experiment_dir.mkdir(exist_ok=True, parents=True)
    pipeline = get_benchmark(benchmark)(eval_conf)
    return pipeline.run(
        experiment_dir, model=model, overwrite=True, overwrite_eval=True
    )
