"""Checkpoint management on Orbax
(reference `gluefactory/utils/experiments.py:93-190`).

Checkpoint = {params, opt_state (optional), step, epoch, eval best} saved via
`orbax.checkpoint`, plus `conf.yaml` beside it so `load_experiment` can
rebuild the model exactly as the reference does (`experiments.py:121-148`).
Retention GC keeps the last N; `best` is tracked by a conf key.
"""

from __future__ import annotations

import json
import re
import shutil
from pathlib import Path

import numpy as np
import orbax.checkpoint as ocp

from .. import logger
from ..core.config import Config
from ..settings import TRAINING_PATH


def _ckpt_dirs(exp_dir: Path):
    out = []
    for p in exp_dir.glob("checkpoint_*"):
        m = re.match(r"checkpoint_(\d+)$", p.name)
        if m and p.is_dir():
            out.append((int(m.group(1)), p))
    return sorted(out)


def save_experiment(
    exp_dir,
    tree: dict,
    conf: Config | None = None,
    step: int = 0,
    best_eval: float | None = None,
    cur_eval: float | None = None,
    keep_last: int = 10,
    tag: str | None = None,
):
    """Save a checkpoint; maintain `checkpoint_best` and retention GC
    (reference `experiments.py:153-190`). Returns the new best_eval."""
    exp_dir = Path(exp_dir)
    exp_dir.mkdir(parents=True, exist_ok=True)
    name = f"checkpoint_{step}" if tag is None else f"checkpoint_{tag}"
    path = exp_dir / name
    if path.exists():
        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path.absolute() / "state", tree)
    ckptr.wait_until_finished()
    meta = {"step": step, "eval": cur_eval}
    (path / "meta.json").write_text(json.dumps(meta))
    if conf is not None:
        conf.save(path / "conf.yaml")
    logger.info(f"saved checkpoint {path.name}")

    if cur_eval is not None and (best_eval is None or cur_eval < best_eval):
        best = exp_dir / "checkpoint_best"
        if best.exists():
            shutil.rmtree(best)
        shutil.copytree(path, best)
        logger.info(f"new best checkpoint (eval={cur_eval:.4f})")
        best_eval = cur_eval

    # retention GC (reference `delete_old_checkpoints`, `experiments.py:108`)
    ckpts = _ckpt_dirs(exp_dir)
    for _, p in ckpts[:-keep_last] if keep_last > 0 else []:
        shutil.rmtree(p)
    return best_eval


def get_last_checkpoint(exp, allow_interrupted: bool = True) -> Path:
    exp_dir = TRAINING_PATH / exp if not Path(exp).exists() else Path(exp)
    if (Path(exp_dir) / "state").exists():  # already a checkpoint dir
        return Path(exp_dir)
    ckpts = _ckpt_dirs(Path(exp_dir))
    intr = Path(exp_dir) / "checkpoint_interrupted"
    if allow_interrupted and intr.exists():
        # rank the interrupted checkpoint by its RECORDED step — appending
        # it unconditionally last used to beat newer numbered checkpoints
        # (observed r5: an OOM-killed run restored to a stale interrupted
        # save 2350 iters behind checkpoint_best)
        try:
            step = int(json.loads((intr / "meta.json").read_text())["step"])
        except Exception:
            step = -1
        ckpts = sorted(ckpts + [(step, intr)])
    if not ckpts:
        raise FileNotFoundError(f"no checkpoints in {exp_dir}")
    return ckpts[-1][1]


def get_best_checkpoint(exp) -> Path:
    exp_dir = TRAINING_PATH / exp if not Path(exp).exists() else Path(exp)
    if (Path(exp_dir) / "state").exists():  # already a checkpoint dir
        return Path(exp_dir)
    best = Path(exp_dir) / "checkpoint_best"
    if not best.exists():
        return get_last_checkpoint(exp)
    return best


def load_checkpoint(path: Path, template=None):
    """Restore the state pytree (with dtype/shape template if given)."""
    ckptr = ocp.StandardCheckpointer()
    state_path = Path(path).absolute() / "state"
    if template is not None:
        return ckptr.restore(state_path, template)
    return ckptr.restore(state_path)


def load_experiment(exp, conf=None, get_last=False, ckpt=None):
    """Rebuild a trained model: (model, params, stored_conf)
    (reference `experiments.py:121-148`)."""
    from ..models import get_model

    if ckpt is None:
        ckpt = get_last_checkpoint(exp) if get_last else get_best_checkpoint(exp)
    ckpt = Path(ckpt)
    stored_conf = Config.load(ckpt / "conf.yaml")
    model_conf = Config.merge(stored_conf.get("model", stored_conf), conf or {})
    model = get_model(model_conf["name"]).from_conf(model_conf)
    state = load_checkpoint(ckpt)
    variables = state["params"] if "params" in state else state
    # `state["params"]` is the full flax variables dict ({"params": ...});
    # tolerate older checkpoints that stored the inner params directly
    if "params" not in variables:
        variables = {"params": variables}
    return model, variables, stored_conf


def verify_checkpoint_loading(params_before, params_after) -> bool:
    """Check that restore actually changed/matched parameters
    (fork `experiments.py:21`)."""
    import jax

    leaves_b = jax.tree_util.tree_leaves(params_before)
    leaves_a = jax.tree_util.tree_leaves(params_after)
    if len(leaves_b) != len(leaves_a):
        return False
    return all(
        np.asarray(a).shape == np.asarray(b).shape
        for a, b in zip(leaves_a, leaves_b)
    )
