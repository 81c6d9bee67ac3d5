"""Generic trainer (reference `gluefactory/train.py:40-1489`).

TPU-native redesign of the reference's 1.5k-line torch loop:
  - one jitted `train_step` = forward + loss + grad + optax update, compiled
    over a `Mesh` with the batch sharded on the "data" axis; XLA inserts the
    gradient all-reduce (the DDP analog, SURVEY.md §5.8);
  - NaN skip happens *inside* the graph: non-finite grads zero the update on
    every shard consistently (the reference's all_reduce(PRODUCT) consensus,
    `train.py:1115-1126`, without a host round-trip);
  - submodel freezing (`conf.model.<sub>.trainable=false`) via optax masking
    (the reference freezes torch parameters, `base_model.py:88-102`);
  - explicit RNG key threading replaces fork_rng seed discipline;
  - Orbax checkpoints with best-tracking + retention (`utils/experiments.py`).
"""

from __future__ import annotations

import signal
import sys
import time
from collections import defaultdict
from pathlib import Path

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import logger
from ..core.config import Config
from ..datasets import get_dataset
from ..models import get_model
from ..parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch
from ..settings import TRAINING_PATH
from ..utils.experiments import get_last_checkpoint, load_checkpoint, save_experiment
from ..utils.tools import AverageMetric, MedianMetric, set_seed

default_train_conf = {
    "seed": 0,
    "epochs": 1,
    "optimizer": "adam",
    "opt_regexp": None,
    "optimizer_options": {},
    "lr": 0.001,
    "lr_schedule": {"type": None, "start": 0, "exp_div_10": 0, "on_epoch": False},
    "lr_scaling": [],
    "eval_every_iter": 1000,
    "save_every_iter": 5000,
    # End-of-epoch checkpointing (reference behavior). On short synthetic
    # epochs through the axon tunnel one save (a full device_get of
    # params+opt_state) can cost ~10x the epoch's compute — set False and
    # rely on save_every_iter/eval saves for such runs.
    "save_every_epoch": True,
    "log_every_iter": 200,
    "log_grad_every_iter": None,
    "keep_last_checkpoints": 10,
    "load_experiment": None,
    "median_metrics": [],
    "recall_metrics": {},
    "pr_metrics": {},
    # fork diagnostics (reference `train.py:125-170,280-299`)
    "eval_overlap_bins": None,  # [[lo, hi], ...] -> per-bin metric buckets
    "log_metrics_path": None,  # TSV filename under the experiment dir
    # one-time GT-label figure dumps from the first val batches (reference
    # `train.py:86-94,771-848` log_gt_pos_* flags); PNGs under the
    # experiment dir + TB figures
    "log_gt_pos_val_once": False,
    "log_gt_pos_neg_ign_val_once": False,
    "log_gt_pos_sparse_map_val_once": False,
    "log_gt_figures_n_pairs": 2,
    "best_key": "loss/total",
    "dataset_callback_fn": None,
    "dataset_callback_on_val": False,
    "clip_grad": None,
    "pr_curves": {},
    "plot": None,
    "submodules": [],
    "overfit": False,
    "mixed_precision": None,  # "bf16" casts the forward to bfloat16
    "allow_idle_devices": False,  # opt-in to batch%devices!=0 idling chips
    "profile_iters": 4,  # device-trace window for --profile
    # image tensors are cast to this dtype for the host->device transfer
    # (models cast to their compute dtype anyway); halves the per-step RPC
    # payload — and, on the leaky axon tunnel (CLAUDE.md), the leaked bytes
    "transfer_dtype": None,  # e.g. "bfloat16"
    # graceful exit before the kernel OOM-killer: when host RSS exceeds
    # this, save a checkpoint and exit(75) so a wrapper can --restore.
    # Motivated by the axon tunnel client leaking EVERY host->device
    # transfer (~44 MB/iter at batch 32; a 3000-iter run was OOM-killed
    # at 130 GB RSS). None = off.
    "max_host_rss_gb": None,
}


@flax.struct.dataclass
class TrainState:
    params: dict
    opt_state: dict
    step: jnp.ndarray
    rng: jnp.ndarray | None = None  # for in-graph augmentations ("aug" stream)


def frozen_submodels(model_conf: Config) -> set:
    """Top-level submodel keys frozen via `trainable: false`."""
    frozen = set()
    for key in ("extractor", "matcher", "filter", "solver", "ground_truth"):
        sub = model_conf.get(key)
        if sub and sub.get("name") and not sub.get("trainable", True):
            frozen.add(key)
    return frozen


def _grad_leaf_names(grads):
    """Flatten a grads pytree into {dotted-path: leaf} (flax params dicts)."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    out = {}
    for path, leaf in flat:
        name = ".".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        out[name] = leaf
    return out


def audit_gradient_connectivity(model, params, data, rng, frozen_roots=()):
    """Detect params with no gradient signal (reference `train.py:1129-1138`).

    The torch analog is `param.grad is None` after backward — a param the
    loss never touches, which deadlocks DDP with activation checkpointing.
    In JAX every leaf always gets a gradient array, so the analog is a leaf
    whose gradient is *identically zero* on a real batch. Frozen submodels
    are excluded (their zero update is intentional, applied by optax).

    Returns the list of disconnected leaf names; raises RuntimeError if any.
    """
    model_loss = model.make_loss_fn()

    def scalar_loss(p):
        pred = model.apply(p, data, train=True, rngs={"aug": rng})
        losses, _ = model_loss(pred, {**data, **pred})
        return jnp.mean(losses["total"].astype(jnp.float32))

    grads = jax.jit(jax.grad(scalar_loss))(params)
    leaves = _grad_leaf_names(grads)
    dead = []
    for name, g in leaves.items():
        root = name.split(".")[1] if name.startswith("params.") else name.split(".")[0]
        if root in frozen_roots:
            continue
        if not bool(jnp.any(g != 0)):
            dead.append(name)
            logger.warning(f"param {name} has no gradient signal.")
    if dead:
        raise RuntimeError(
            f"Detected anomaly in training: {len(dead)} parameter leaves "
            f"receive no gradient (e.g. {dead[:5]})."
        )
    return dead


def build_optimizer(conf: Config, model_conf: Config):
    """optax chain from train conf (reference `train.py:965-1000`)."""
    base = {
        "adam": optax.adam,
        "adamw": optax.adamw,
        "sgd": optax.sgd,
        "rmsprop": optax.rmsprop,
    }[conf.optimizer]

    # YAML 1.1 parses bare "1e-4"/"20e3" as strings; coerce numerics
    lr = float(conf.lr)
    s = {k: v for k, v in dict(conf.lr_schedule).items()}
    start = float(s.get("start", 0) or 0)
    total = float(s.get("total", 100000) or 100000)

    def schedule(count):
        if s["type"] == "exp":
            div = float(s.get("exp_div_10", 0) or 0)
            gam = 10 ** (-1.0 / div) if div else 1.0
            steps = jnp.maximum(count - start, 0)
            return lr * gam**steps
        if s["type"] == "cosine":
            span = max(total - start, 1.0)
            steps = jnp.clip(count - start, 0, span)
            return lr * 0.5 * (1 + jnp.cos(jnp.pi * steps / span))
        if s["type"] == "linear":
            span = max(total - start, 1.0)
            steps = jnp.clip(count - start, 0, span)
            return lr * (1 - steps / span)
        return lr

    tx = base(schedule, **dict(conf.optimizer_options))
    if conf.clip_grad:
        tx = optax.chain(optax.clip_by_global_norm(conf.clip_grad), tx)

    # freeze submodels with trainable=false (reference freezes params)
    frozen_roots = frozen_submodels(model_conf)
    if frozen_roots:
        def label_tree(params):
            # params is the flax variables dict: {"params": {extractor: ...}}
            def label_inner(inner):
                return {
                    k: jax.tree.map(
                        lambda _: "frozen" if k in frozen_roots else "train", v
                    )
                    for k, v in inner.items()
                }

            if "params" in params and isinstance(params["params"], dict):
                return {
                    k: (label_inner(v) if k == "params" else
                        jax.tree.map(lambda _: "train", v))
                    for k, v in params.items()
                }
            return label_inner(params)

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label_tree
        )
    return tx


def make_step_fns(model, tx, mesh, mp_dtype=None, want_grad_norms=False):
    """Build jitted (train_step, eval_step) over the mesh.

    `want_grad_norms` adds per-leaf gradient L2 norms to the step stats
    (scalars only — cheap) for `train.log_grad_every_iter` diagnostics
    (reference `train.py:1185-1199` writes per-param grad histograms/norms).
    """
    b_shard = batch_sharding(mesh)
    r_shard = replicated(mesh)

    model_loss = model.make_loss_fn()  # built outside the trace (flax rule)

    def loss_fn(params, data, rng):
        if mp_dtype is not None:
            params = jax.tree.map(
                lambda x: x.astype(mp_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                params,
            )
        pred = model.apply(params, data, train=True, rngs={"aug": rng})
        losses, metrics = model_loss(pred, {**data, **pred})
        total = jnp.mean(losses["total"].astype(jnp.float32))
        return total, (losses, metrics)

    def train_step(state: TrainState, data):
        rng = state.rng if state.rng is not None else jax.random.PRNGKey(0)
        rng, step_rng = jax.random.split(rng)
        (_, (losses, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, data, step_rng)
        # in-graph NaN/Inf skip (consistent across shards automatically)
        flat = jax.tree_util.tree_leaves(grads)
        ok = jnp.all(
            jnp.stack([jnp.all(jnp.isfinite(g)) for g in flat])
        ) & jnp.isfinite(jnp.mean(losses["total"]))
        grads = jax.tree.map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1, rng)
        stats = {
            "skipped": (~ok).astype(jnp.float32),
            "grad_norm": optax.global_norm(grads),
        }
        if want_grad_norms:
            stats["grad_norms"] = {
                name: jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
                for name, g in _grad_leaf_names(grads).items()
            }
        return new_state, losses, metrics, stats

    def eval_step(params, data):
        pred = model.apply(
            params, data, train=True, rngs={"aug": jax.random.PRNGKey(0)}
        )
        # same dict precedence as the train path: in-forward GT (pred) wins
        # over any cached gt_* keys a dataset may supply
        losses, metrics = model_loss(pred, {**data, **pred})
        return losses, metrics

    def pred_step(params, data):
        # full prediction dict for validation figures (train=True so GT
        # labels are generated in-forward for match coloring)
        return model.apply(
            params, data, train=True, rngs={"aug": jax.random.PRNGKey(0)}
        )

    train_step = jax.jit(
        train_step,
        in_shardings=(r_shard, b_shard),
        out_shardings=(r_shard, r_shard, r_shard, r_shard),
        donate_argnums=(0,),
    )
    eval_step = jax.jit(eval_step, in_shardings=(r_shard, b_shard))
    pred_step = jax.jit(pred_step, in_shardings=(r_shard, b_shard))
    return train_step, eval_step, pred_step


def do_evaluation(
    eval_step,
    params,
    loader,
    mesh,
    conf,
    step=None,
    log_dir=None,
    pred_step=None,
    writer=None,
):
    """Stream val loss/metrics into accumulators (reference `train.py:99-313`).

    Fork diagnostics:
      - `conf.eval_overlap_bins` ([[lo, hi], ...]): per-overlap-bin metric
        buckets reported as `overlap_{lo}_{hi}/<metric>` (reference
        `train.py:125-170, 280-299`) — exposes easy/hard-pair regressions a
        single average hides.
      - `conf.log_metrics_path`: per-pair TSV appended under the experiment
        dir with step/index/name/overlap and the per-pair metrics.
    """
    results = defaultdict(AverageMetric)
    medians = defaultdict(MedianMetric)
    bins = [
        (float(lo), float(hi), f"overlap_{float(lo):.2f}_{float(hi):.2f}")
        for lo, hi in (conf.get("eval_overlap_bins") or [])
    ]
    bin_acc = {name: defaultdict(AverageMetric) for _, _, name in bins}
    log_file = None
    if conf.get("log_metrics_path") and log_dir is not None:
        path = Path(log_dir) / str(conf.log_metrics_path)
        write_header = not path.exists() or path.stat().st_size == 0
        log_file = path.open("a", encoding="ascii")
        log_keys = None

    idx_base = 0
    for data in loader:
        sharded = prepare_batch(data, mesh)
        losses, metrics = eval_step(params, sharded)
        if (
            idx_base == 0
            and pred_step is not None
            and writer is not None
            and conf.get("plot")
        ):
            # validation match figures (reference `train.plot` ->
            # `visualize_batch.make_match_figures`, train.py:1259-1270)
            plot_conf = conf.plot
            n_pairs = int(
                plot_conf[0]
                if isinstance(plot_conf, (list, tuple))
                else plot_conf
            )
            try:
                from ..visualization.visualize_batch import make_match_figures

                pred = jax.device_get(pred_step(params, sharded))
                for name, fig in make_match_figures(
                    pred, data, n_pairs=n_pairs
                ).items():
                    writer.add_figure(f"val/{name}", fig, global_step=step)
            except Exception as e:  # figures must never kill training
                logger.warning(f"validation figures failed: {e}")
        overlap = data.get("overlap_0to1")
        overlap = None if overlap is None else np.asarray(overlap).reshape(-1)
        for k, v in {**losses, **metrics}.items():
            v = np.asarray(v)
            results[f"loss/{k}" if k in losses else k].update(v)
            if k in conf.median_metrics:
                medians[f"{k}_median"].update(v)
            if overlap is not None and k not in losses and v.shape == overlap.shape:
                for lo, hi, name in bins:
                    mask = (overlap >= lo) & (overlap < hi)
                    if mask.any():
                        bin_acc[name][k].update(v[mask])
        if log_file is not None:
            names = data.get("name")
            per_pair = {
                k: np.asarray(v)
                for k, v in metrics.items()
                if np.asarray(v).ndim == 1
            }
            if log_keys is None:
                log_keys = sorted(per_pair)
                if write_header:
                    log_file.write(
                        "step\tindex\tname\toverlap\t" + "\t".join(log_keys) + "\n"
                    )
            B = len(next(iter(per_pair.values()))) if per_pair else 0
            for b in range(B):
                name = names[b] if names is not None else ""
                ov = f"{overlap[b]:.4f}" if overlap is not None else ""
                vals = "\t".join(f"{per_pair[k][b]:.6f}" for k in log_keys)
                log_file.write(f"{step}\t{idx_base + b}\t{name}\t{ov}\t{vals}\n")
        idx_base += int(np.asarray(data["idx"]).size) if "idx" in data else 1
    if log_file is not None:
        log_file.close()
    out = {k: m.compute() for k, m in results.items()}
    out.update({k: m.compute() for k, m in medians.items()})
    for _, _, name in bins:
        for k, m in bin_acc[name].items():
            out[f"{name}/{k}"] = m.compute()
    return out


def dump_gt_figures(pred_step, params, loader, mesh, conf, output_dir, writer):
    """One-time GT diagnostic dumps (reference `train.py:771-848`):
    run the model on the first val batch(es), render the requested figure
    suites, write PNGs under `<exp>/<suite>/` and TB figures."""
    from ..visualization.gt_visualize_matches import (
        make_gt_pos_figures,
        make_gt_pos_neg_ign_figures,
        make_gt_sparse_map_figures,
    )

    suites = []
    if conf.get("log_gt_pos_val_once"):
        suites.append(("gt_pos_val", make_gt_pos_figures))
    if conf.get("log_gt_pos_neg_ign_val_once"):
        suites.append(("gt_pos_neg_ign_val", make_gt_pos_neg_ign_figures))
    if conf.get("log_gt_pos_sparse_map_val_once"):
        suites.append(("gt_pos_sparse_map_val", make_gt_sparse_map_figures))
    if not suites:
        return
    n = int(conf.get("log_gt_figures_n_pairs", 2))
    try:
        data = next(iter(loader))
        sharded = prepare_batch(data, mesh)
        pred = jax.device_get(pred_step(params, sharded))
        if "gt_matches0" not in pred:
            logger.warning("GT figure dump skipped: no gt_matches0 in pred")
            return
        for name, make in suites:
            out = Path(output_dir) / name
            out.mkdir(parents=True, exist_ok=True)
            for fig_name, fig in make(pred, data, n=n).items():
                fig.savefig(out / f"{fig_name}.png", dpi=110)
                if writer is not None:
                    writer.add_figure(f"{name}/{fig_name}", fig, global_step=0)
            logger.info(f"wrote {name} GT figures to {out}")
    except Exception as e:  # diagnostics must never kill training
        logger.warning(f"GT figure dump failed: {e}")


def prepare_batch(data, mesh, transfer_dtype=None):
    """Host numpy batch -> device, batch axis sharded over `mesh`.

    `transfer_dtype` (e.g. "bfloat16") downcasts float32 IMAGE tensors for
    the transfer only — models cast inputs to their compute dtype anyway."""
    def keep(x):
        return not isinstance(x, (str, list)) and x is not None

    tdt = None
    if transfer_dtype:
        tdt = jnp.bfloat16 if transfer_dtype == "bfloat16" else jnp.dtype(
            transfer_dtype)

    def to_host(path, x):
        if not keep(x):
            return None
        x = np.asarray(x)
        if (
            tdt is not None
            and x.dtype == np.float32
            and path and str(getattr(path[-1], "key", "")) == "image"
        ):
            return x.astype(tdt)
        return x

    arrays = jax.tree_util.tree_map_with_path(
        to_host,
        data,
        is_leaf=lambda x: isinstance(x, (list, str)) or x is None,
    )
    return shard_batch(arrays, mesh)


def _host_rss_gb() -> float:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1e6
    except OSError:
        pass
    return 0.0


def training(conf: Config, output_dir: Path, args=None):
    """Main entry (reference `train.py:565-1406`)."""
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    train_conf = Config.merge(Config(default_train_conf), conf.get("train", {}))
    set_seed(train_conf.seed)

    writer = None
    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(str(output_dir))
    except Exception as e:  # tensorboard optional
        logger.warning(f"no tensorboard writer: {e}")

    logger.info("building dataset and model")
    dataset = get_dataset(conf.data.name)(conf.data)
    if train_conf.overfit:
        train_loader = dataset.get_overfit_loader("train")
        val_loader = dataset.get_overfit_loader("val")
    else:
        train_loader = dataset.get_data_loader("train", distributed=jax.process_count() > 1)
        val_loader = dataset.get_data_loader("val")

    model = get_model(conf.model.name).from_conf(conf.model)
    # the data axis must divide the batch (reference errors loudly on bad DDP
    # configs, train.py:631-638); leaving devices idle silently costs up to
    # n_dev/gcd x throughput on a pod, so it is a hard error unless opted in
    import math

    n_dev = len(jax.devices())
    # loaders yield per-host batches (DDP semantics): the global batch is
    # batch_size x process_count
    batch = int(dataset.conf.get("train_batch_size", 1)) * jax.process_count()
    data_axis = math.gcd(batch, n_dev)
    if data_axis < n_dev:
        msg = (
            f"global batch size {batch} is not divisible by {n_dev} devices: "
            f"only {data_axis}-way data parallelism is possible and "
            f"{n_dev - data_axis} devices would sit idle"
        )
        if not train_conf.get("allow_idle_devices", False):
            raise ValueError(
                msg + ". Fix the batch size or set train.allow_idle_devices=true."
            )
        logger.warning(msg + " (allow_idle_devices=true)")
    mesh = make_mesh(data=data_axis, model=1, devices=jax.devices()[:data_axis])
    logger.info(f"mesh: {mesh}")

    # init params from a template batch
    transfer_dtype = train_conf.get("transfer_dtype", None)
    template = prepare_batch(next(iter(train_loader)), mesh, transfer_dtype)
    rng = jax.random.PRNGKey(train_conf.seed)
    rng, init_rng, aug_rng = jax.random.split(rng, 3)
    params = model.init({"params": init_rng, "aug": aug_rng}, template, train=True)

    if train_conf.load_experiment:
        from ..utils.experiments import get_best_checkpoint

        ckpt = get_best_checkpoint(train_conf.load_experiment)
        restored = load_checkpoint(ckpt)
        params = {"params": restored["params"]}
        logger.info(f"loaded experiment {train_conf.load_experiment}")

    tx = build_optimizer(train_conf, conf.model)
    opt_state = tx.init(params)
    state = TrainState(params, opt_state, jnp.asarray(0), rng)

    start_epoch = 0
    best_eval = None
    if args is not None and getattr(args, "restore", False):
        ckpt = get_last_checkpoint(output_dir)
        template = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = load_checkpoint(ckpt, template)
        state = TrainState(
            restored["params"], restored["opt_state"], restored["step"], state.rng
        )
        start_epoch = int(np.asarray(state.step)) // max(len(train_loader), 1)
        logger.info(f"restored from {ckpt} at step {int(np.asarray(state.step))}")

    detect_anomaly = args is not None and getattr(args, "detect_anomaly", False)
    mp = {"bf16": jnp.bfloat16, None: None}[train_conf.mixed_precision]
    train_step, eval_step, pred_step = make_step_fns(
        model, tx, mesh, mp,
        want_grad_norms=(
            train_conf.log_grad_every_iter is not None or detect_anomaly
        ),
    )

    if detect_anomaly:
        # torch `--detect_anomaly` analog: (a) locate NaN-producing ops by
        # re-running op-by-op on NaN (jax_debug_nans), (b) audit gradient
        # connectivity from the FIRST train step's per-leaf grad norms
        # (reference `train.py:1129-1138` checks `param.grad is None` after
        # the first backward). Reusing the train step avoids compiling a
        # second full-model gradient graph just for the audit
        # (`audit_gradient_connectivity` stays available as the library API).
        jax.config.update("jax_debug_nans", True)
        logger.info(
            "detect_anomaly: NaN localization on; will audit gradient "
            "connectivity after the first step"
        )

    # --profile: jax.profiler device trace over a few post-compile steps
    # (reference `train.py:1014-1022,1160-1161` torch.profiler schedule:
    # wait 1 compile step, then `profile_iters` active steps -> TB trace)
    profiling = args is not None and getattr(args, "profile", False)
    prof = {"stack": None, "done": not profiling, "start": None}

    def profile_step(rel_iter):
        from contextlib import ExitStack

        from ..utils.profiling import profile_trace

        if prof["done"]:
            return
        if prof["stack"] is None and rel_iter >= 1:  # skip the compile step
            jax.block_until_ready(state.params)
            prof["stack"] = ExitStack()
            prof["stack"].enter_context(profile_trace(output_dir / "profile"))
            prof["start"] = rel_iter
            logger.info(f"profiling {train_conf.profile_iters} steps")
        elif (
            prof["stack"] is not None
            and rel_iter - prof["start"] >= int(train_conf.profile_iters)
        ):
            jax.block_until_ready(state.params)
            prof["stack"].close()
            prof["done"] = True
            logger.info(f"profile trace written to {output_dir / 'profile'}")

    if jax.process_index() == 0:
        # one-time GT diagnostic dumps (reference log_gt_pos_* flags)
        dump_gt_figures(
            pred_step, state.params, val_loader, mesh, train_conf,
            output_dir, writer,
        )

    stop_flag = {"stop": False}

    def sigint_handler(signum, frame):
        if stop_flag["stop"]:
            raise KeyboardInterrupt
        logger.info("SIGINT: will stop after this iteration (again to force)")
        stop_flag["stop"] = True

    old_handler = signal.signal(signal.SIGINT, sigint_handler)

    n_iter = start_iter = int(np.asarray(state.step))
    is_leader = jax.process_index() == 0
    losses_acc = defaultdict(AverageMetric)

    def run_epoch_benchmarks(epoch):
        """Embedded benchmarks (reference `train.py:1028-1047`)."""
        benchmarks = conf.get("benchmarks", {}) or {}
        if not benchmarks or not is_leader:
            return
        from ..eval import run_benchmark

        for bname, bconf in benchmarks.items():
            try:
                bench_dir = output_dir / "benchmarks" / bname / f"epoch_{epoch}"
                s, _, _ = run_benchmark(
                    bname,
                    Config.merge(Config({"model": conf.model.to_dict()}), bconf),
                    bench_dir,
                    model=(model, state.params),
                )
                logger.info(f"[benchmark {bname}] {s}")
                if writer:
                    for k, v in s.items():
                        if isinstance(v, (int, float)) and np.isfinite(v):
                            writer.add_scalar(f"benchmark/{bname}/{k}", v, n_iter)
            except Exception as e:
                logger.warning(f"benchmark {bname} failed: {e}")

    try:
        for epoch in range(start_epoch, train_conf.epochs):
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)
            if train_conf.dataset_callback_fn and hasattr(
                dataset, train_conf.dataset_callback_fn
            ):
                getattr(dataset, train_conf.dataset_callback_fn)(
                    train_conf.seed + epoch
                )
            t_last = time.time()
            for it, data in enumerate(train_loader):
                data = prepare_batch(data, mesh, transfer_dtype)
                state, losses, metrics, stats = train_step(state, data)
                profile_step(n_iter - start_iter)
                if detect_anomaly and n_iter == start_iter:
                    frozen = frozen_submodels(conf.model)
                    dead = [
                        name
                        for name, g in jax.device_get(
                            stats["grad_norms"]
                        ).items()
                        if float(g) == 0.0
                        and name.split(".")[1 if name.startswith("params.")
                                            else 0] not in frozen
                    ]
                    for name in dead:
                        logger.warning(f"param {name} has no gradient signal.")
                    if dead:
                        raise RuntimeError(
                            f"Detected anomaly in training: {len(dead)} "
                            f"parameter leaves receive no gradient "
                            f"(e.g. {dead[:5]})."
                        )
                n_iter += 1
                for k, v in losses.items():
                    losses_acc[k].update(np.asarray(v))

                if n_iter % train_conf.log_every_iter == 0:
                    dt = time.time() - t_last
                    ips = train_conf.log_every_iter / dt if dt > 0 else 0
                    msg = ", ".join(
                        f"{k} {m.compute():.4f}" for k, m in losses_acc.items()
                    )
                    logger.info(
                        f"[E {epoch} | iter {n_iter}] {msg} | {ips:.2f} it/s"
                    )
                    if writer and is_leader:
                        for k, m in losses_acc.items():
                            writer.add_scalar(f"training/loss/{k}", m.compute(), n_iter)
                        writer.add_scalar(
                            "training/skipped",
                            float(np.asarray(stats["skipped"])),
                            n_iter,
                        )
                        writer.add_scalar(
                            "training/grad_norm",
                            float(np.asarray(stats["grad_norm"])),
                            n_iter,
                        )
                        writer.add_scalar("training/it_per_s", ips, n_iter)
                    losses_acc = defaultdict(AverageMetric)
                    t_last = time.time()
                    rss_cap = train_conf.get("max_host_rss_gb", None)
                    if rss_cap and _host_rss_gb() > float(rss_cap):
                        logger.warning(
                            f"host RSS {_host_rss_gb():.1f} GB > "
                            f"max_host_rss_gb={rss_cap}: checkpointing and "
                            "exiting 75 (restart with --restore; see "
                            "train.max_host_rss_gb)"
                        )
                        stop_flag["stop"] = True
                        stop_flag["rss_watchdog"] = True

                if (
                    train_conf.log_grad_every_iter is not None
                    and n_iter % int(train_conf.log_grad_every_iter) == 0
                    and writer
                    and is_leader
                ):
                    # per-param gradient norms (reference `train.py:1185-1199`)
                    norms = jax.device_get(stats["grad_norms"])
                    grad_txt = ""
                    for name, v in sorted(norms.items()):
                        if name.endswith("bias"):
                            continue
                        writer.add_scalar(f"grad/{name}", float(v), n_iter)
                        grad_txt += f"{name} {float(v):.3f}  \n"
                    writer.add_text("grad/summary", grad_txt, n_iter)

                if n_iter % train_conf.eval_every_iter == 0 or (
                    stop_flag["stop"]
                ):
                    results = do_evaluation(
                        eval_step, state.params, val_loader, mesh, train_conf,
                        step=n_iter, log_dir=output_dir,
                        pred_step=pred_step,
                        writer=writer if is_leader else None,
                    )
                    # lead with the headline keys, then the rest
                    head = [
                        k
                        for k in (
                            "loss/total",
                            "match_recall",
                            "match_precision",
                            "accuracy",
                            "num_matches",
                        )
                        if k in results
                    ]
                    rest = [k for k in results if k not in head][:4]
                    msg = ", ".join(f"{k} {results[k]:.4f}" for k in head + rest)
                    logger.info(f"[validation iter {n_iter}] {msg}")
                    if writer and is_leader:
                        for k, v in results.items():
                            if np.isscalar(v) or np.ndim(v) == 0:
                                writer.add_scalar(f"val/{k}", float(v), n_iter)
                    cur = results.get(train_conf.best_key)
                    if is_leader:
                        best_eval = save_experiment(
                            output_dir,
                            jax.device_get(
                                {
                                    "params": state.params,
                                    "opt_state": state.opt_state,
                                    "step": state.step,
                                }
                            ),
                            conf=conf,
                            step=n_iter,
                            best_eval=best_eval,
                            cur_eval=cur,
                            keep_last=train_conf.keep_last_checkpoints,
                        )
                if stop_flag["stop"]:
                    raise KeyboardInterrupt
                if (
                    train_conf.overfit
                    and it + 1 >= train_conf.get("overfit_iters", 100)
                ):
                    break
            # end-of-epoch checkpoint (reference `train.py` saves every
            # epoch; eval-linked saves alone can miss short runs entirely)
            if (
                is_leader and n_iter > start_iter
                and train_conf.get("save_every_epoch", True)
            ):
                best_eval = save_experiment(
                    output_dir,
                    jax.device_get(
                        {
                            "params": state.params,
                            "opt_state": state.opt_state,
                            "step": state.step,
                        }
                    ),
                    conf=conf,
                    step=n_iter,
                    best_eval=best_eval,
                    keep_last=train_conf.keep_last_checkpoints,
                )
            if conf.get("benchmarks"):
                run_epoch_benchmarks(epoch)
    except KeyboardInterrupt:
        if prof["stack"] is not None and not prof["done"]:
            prof["stack"].close()
            prof["done"] = True
        logger.info("interrupted; saving checkpoint_interrupted")
        if is_leader:
            save_experiment(
                output_dir,
                jax.device_get(
                    {
                        "params": state.params,
                        "opt_state": state.opt_state,
                        "step": state.step,
                    }
                ),
                conf=conf,
                step=n_iter,
                tag="interrupted",
            )
    finally:
        signal.signal(signal.SIGINT, old_handler)
        if writer:
            writer.close()
    if stop_flag.get("rss_watchdog"):
        # EX_TEMPFAIL: a wrapper loop can `--restore` into a fresh process
        # (the axon tunnel client leaks every host->device transfer; long
        # runs must recycle the process before the kernel OOM-killer hits)
        sys.exit(75)
    return state


def main_cli(argv=None):
    import argparse

    parser = argparse.ArgumentParser(
        description="Train a model (reference `train.py:1418-1450`)"
    )
    parser.add_argument("experiment", type=str)
    parser.add_argument("--conf", type=str)
    parser.add_argument("--restore", action="store_true")
    parser.add_argument("--overfit", action="store_true")
    parser.add_argument("--distributed", action="store_true")
    parser.add_argument(
        "--profile", action="store_true",
        help="jax.profiler trace over train.profile_iters post-compile steps "
        "(reference train.py:1014-1022)",
    )
    parser.add_argument(
        "--detect_anomaly", "--da", action="store_true",
        help="audit gradient connectivity + localize NaN-producing ops "
        "(reference train.py:962-963,1129-1138)",
    )
    parser.add_argument("dotlist", nargs="*")
    args = parser.parse_args(argv)

    import os

    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        # the axon TPU plugin ignores the env var; mirror it into the
        # authoritative config knob so CI/pod smoke runs can force CPU
        jax.config.update("jax_platforms", "cpu")

    if args.distributed:
        try:
            jax.distributed.initialize()
        except Exception as e:
            # single-process smoke of the pod launcher (no coordinator):
            # proceed with process_count() == 1 rather than dying
            logger.warning(
                f"jax.distributed.initialize failed ({e}); "
                "continuing single-process"
            )

    conf = Config()
    if args.conf:
        path = Path(args.conf)
        if not path.exists():
            path = Path(__file__).parent.parent / "configs" / f"{args.conf}.yaml"
        conf = Config.load(path)
    conf.merge_(Config.from_dotlist(args.dotlist))
    if args.overfit:
        conf.merge_({"train": {"overfit": True}})
    output_dir = TRAINING_PATH / args.experiment
    output_dir.mkdir(parents=True, exist_ok=True)
    conf.save(output_dir / "config.yaml")
    # reproducibility: snapshot the package source into the experiment dir
    # (reference `train.py:1476-1479`)
    try:
        import tarfile

        pkg_root = Path(__file__).parent.parent
        with tarfile.open(output_dir / "source_snapshot.tar.gz", "w:gz") as tar:
            tar.add(
                pkg_root,
                arcname="gluefactory_tpu",
                filter=lambda ti: None if "__pycache__" in ti.name else ti,
            )
    except Exception as e:
        logger.warning(f"source snapshot failed: {e}")
    if jax.process_index() == 0:
        # leader tees stdout/stderr -> log.txt (reference train.py:1408-1416)
        from ..utils.stdout_capturing import capture_outputs

        with capture_outputs(output_dir / "log.txt"):
            training(conf, output_dir, args)
    else:
        training(conf, output_dir, args)


if __name__ == "__main__":
    main_cli()
