"""Eval IO helpers (reference `gluefactory/eval/io.py:34-110`)."""

from __future__ import annotations

import argparse
from pathlib import Path
from pprint import pprint

import jax

from ..core.config import Config
from ..models import get_model
from ..settings import TRAINING_PATH
from ..utils.experiments import get_best_checkpoint, load_checkpoint


def parse_config_path(name_or_path, default_configs_dir) -> Path:
    default = Path(default_configs_dir) / f"{name_or_path}.yaml"
    if default.exists():
        return default
    path = Path(name_or_path)
    if path.exists():
        return path
    raise FileNotFoundError(f"cannot find config {name_or_path}")


def extract_benchmark_conf(conf: Config, benchmark: str) -> Config:
    """Select per-benchmark nested overrides under `benchmarks:`
    (reference `eval/io.py:34-45`)."""
    out = Config(
        {k: v for k, v in conf.items() if k in ("model", "data", "eval")}
    )
    bench = conf.get("benchmarks", {})
    if benchmark in (bench or {}):
        out.merge_(bench[benchmark])
    return out


def load_model(model_conf: Config | None, checkpoint: str | None):
    """Build model + params from a checkpoint or conf (reference `io.py:88-98`).

    Returns (model, variables) where variables={"params": ...} or None when
    the model must be initialized by the caller (no trained weights).
    """
    if checkpoint:
        from ..utils.experiments import load_experiment

        # eval default confs carry `name: None` placeholders ("use the
        # checkpoint's model"); merging them verbatim would clobber the
        # stored model name. Drop None names at the top level only —
        # nested `ground_truth: {name: None}` is a deliberate "disable
        # GT generation for eval" override and must survive.
        od = model_conf.to_dict() if model_conf is not None else {}
        if od.get("name") is None:
            od.pop("name", None)
        od.pop("checkpoint", None)  # routing key, not a model-conf key
        model, variables, _ = load_experiment(checkpoint, conf=od)
        return model, variables
    assert model_conf is not None and model_conf.get("name"), "no model conf"
    model = get_model(model_conf["name"]).from_conf(model_conf)
    return model, None


def get_eval_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--tag", type=str, default=None)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--conf", type=str, default=None)
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--overwrite_eval", action="store_true")
    parser.add_argument("--plot", action="store_true")
    parser.add_argument("dotlist", nargs="*")
    return parser


def parse_eval_args(benchmark, args, configs_path, default_conf=None):
    """Assemble the eval conf from tag/conf/checkpoint/dotlist
    (reference `eval/io.py:47-86`)."""
    conf = Config({"data": {}, "model": {}, "eval": {}})
    if default_conf is not None:
        conf = Config.merge(conf, default_conf)
    if args.conf:
        conf_path = parse_config_path(args.conf, configs_path)
        custom = Config.load(conf_path)
        conf = Config.merge(conf, extract_benchmark_conf(custom, benchmark))
        args.tag = args.tag or conf_path.stem
    conf.merge_(Config.from_dotlist(args.dotlist))

    name = args.tag or args.checkpoint or "default"
    if args.checkpoint:
        conf.merge_({"model": {"checkpoint": args.checkpoint}})
    return name, conf
