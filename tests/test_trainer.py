"""Trainer end-to-end on CPU: short run, checkpoint, restore, overfit mode."""

import numpy as np
import pytest


@pytest.fixture()
def tiny_conf(tmp_path, monkeypatch):
    import gluefactory_tpu.train.trainer as tr

    monkeypatch.setattr(tr, "TRAINING_PATH", tmp_path)
    from gluefactory_tpu.core.config import Config

    return Config(
        {
            "data": {
                "name": "homographies",
                "synthetic": {"enable": True, "num_images": 8, "size": [96, 96]},
                "train_size": 6,
                "val_size": 2,
                "batch_size": 2,
                "num_workers": 1,
                "homography": {
                    "difficulty": 0.4,
                    "max_angle": 20,
                    "patch_shape": [96, 96],
                },
                "photometric": {"name": "identity"},
            },
            "model": {
                "name": "two_view_pipeline",
                "extractor": {
                    "name": "superpoint",
                    "max_num_keypoints": 32,
                    "detection_threshold": 0.0,
                    "channels": [4, 4, 8],
                    "norm": "group",
                    "trainable": False,
                },
                "ground_truth": {"name": "homography_matcher"},
                "matcher": {
                    "name": "lightglue",
                    "n_layers": 2,
                    "descriptor_dim": 32,
                    "input_dim": 256,
                    "num_heads": 2,
                },
            },
            "train": {
                "seed": 0,
                "epochs": 1,
                "log_every_iter": 1,
                "eval_every_iter": 2,
                "lr": 1e-4,
                # tests run batch 2 on the 8-device virtual mesh
                "allow_idle_devices": True,
            },
        }
    )


def test_training_creates_checkpoints_and_restores(tiny_conf, tmp_path):
    from gluefactory_tpu.train.trainer import training
    from gluefactory_tpu.utils.experiments import (
        get_best_checkpoint,
        get_last_checkpoint,
        load_checkpoint,
    )

    out = tmp_path / "exp"
    state = training(tiny_conf, out)
    assert (out / "checkpoint_best").exists()
    last = get_last_checkpoint(out)
    restored = load_checkpoint(last)
    assert "params" in restored and "opt_state" in restored
    assert int(np.asarray(restored["step"])) > 0

    # frozen extractor params unchanged; matcher params changed
    import jax

    p = restored["params"]["params"]
    flat_m = jax.tree_util.tree_leaves(p["matcher"])
    assert any(np.abs(np.asarray(x)).sum() > 0 for x in flat_m)

    # load_experiment round-trip through the best checkpoint
    import gluefactory_tpu.utils.experiments as ex

    model, variables, conf = ex.load_experiment(get_best_checkpoint(out))
    assert conf["model"]["name"] == "two_view_pipeline"


def test_frozen_extractor_params_not_updated(tiny_conf, tmp_path):
    import jax

    from gluefactory_tpu.train.trainer import training

    out = tmp_path / "exp2"
    # capture extractor params at init by re-running with 1 iter
    tiny_conf.merge_({"train": {"epochs": 1}})
    state = training(tiny_conf, out)
    # extractor opt state is set_to_zero -> updates are exactly zero; verify
    # by checking adam moments for the extractor are absent/zero is hard; we
    # instead re-init with the same seed and compare extractor params
    from gluefactory_tpu.datasets import get_dataset
    from gluefactory_tpu.models import get_model
    from gluefactory_tpu.train.trainer import prepare_batch
    from gluefactory_tpu.parallel.mesh import make_mesh

    dataset = get_dataset("homographies")(tiny_conf.data)
    loader = dataset.get_data_loader("train", shuffle=False)
    mesh = make_mesh(data=2, model=1, devices=__import__("jax").devices()[:2])
    template = prepare_batch(next(iter(loader)), mesh)
    model = get_model("two_view_pipeline").from_conf(tiny_conf.model)
    rng = jax.random.PRNGKey(tiny_conf.train["seed"])
    rng, init_rng, aug_rng = jax.random.split(rng, 3)
    params0 = model.init({"params": init_rng, "aug": aug_rng}, template, train=True)
    ex0 = jax.tree_util.tree_leaves(params0["params"]["extractor"])
    ex1 = jax.tree_util.tree_leaves(state.params["params"]["extractor"])
    for a, b in zip(ex0, ex1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_do_evaluation_validation_figures(tmp_path):
    """`train.plot` draws match figures from the first val batch and writes
    them to the summary writer (reference `train.py:1259-1270`)."""
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.core.config import Config
    from gluefactory_tpu.parallel.mesh import make_mesh
    from gluefactory_tpu.train.trainer import do_evaluation

    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    B, K = 2, 8
    rng = np.random.RandomState(0)
    imgs = rng.rand(B, 32, 32, 1).astype(np.float32)
    kp = (rng.rand(B, K, 2) * 31).astype(np.float32)
    pred = {
        "keypoints0": kp,
        "keypoints1": kp,
        "matches0": np.tile(np.arange(K), (B, 1)),
        "gt_matches0": np.tile(np.arange(K), (B, 1)),
        "keypoint_valid0": np.ones((B, K), bool),
    }

    def pred_step(params, data):
        return pred

    def eval_step(params, data):
        return {"total": jnp.zeros(B)}, {}

    loader = [
        {"view0": {"image": imgs}, "view1": {"image": imgs}, "idx": np.arange(B)}
    ]
    figures = {}

    class Writer:
        def add_figure(self, name, fig, global_step=None):
            figures[name] = (fig, global_step)

    conf = Config({"median_metrics": [], "plot": 2})
    do_evaluation(
        eval_step, {}, loader, mesh, conf, step=3,
        pred_step=pred_step, writer=Writer(),
    )
    assert set(figures) == {"val/match_pair_0", "val/match_pair_1"}
    assert figures["val/match_pair_0"][1] == 3


def test_batch_device_mismatch_raises(tiny_conf, tmp_path):
    """batch % devices != 0 is a hard error unless opted in (on a pod a
    silent gcd fallback idles chips; reference DDP errors loudly)."""
    from gluefactory_tpu.train.trainer import training

    tiny_conf.merge_({"train": {"allow_idle_devices": False}})
    with pytest.raises(ValueError, match="allow_idle_devices"):
        training(tiny_conf, tmp_path / "exp_mismatch")


def test_loss_dict_precedence_matches_between_train_and_eval():
    """Train and eval steps must agree on {**data, **pred} precedence:
    in-forward GT (pred) wins over stale cached gt_* keys from a dataset."""
    import jax
    import jax.numpy as jnp
    import optax

    from gluefactory_tpu.parallel.mesh import make_mesh
    from gluefactory_tpu.train.trainer import TrainState, make_step_fns

    B = 2

    class StubModel:
        def make_loss_fn(self):
            def loss(pred, merged):
                # the merged dict decides which gt wins
                return {"total": merged["gt_val"]}, {}

            return loss

        def apply(self, params, data, train=True, rngs=None):
            w = params["params"]["w"]
            # in-forward GT: constant 2, with a param dependency for grad
            return {"gt_val": jnp.full((B,), 2.0) + 0.0 * w}

    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    tx = optax.sgd(0.1)
    params = {"params": {"w": jnp.zeros(())}}
    train_step, eval_step, _ = make_step_fns(StubModel(), tx, mesh)
    data = {"gt_val": np.zeros(B, np.float32)}  # stale cached GT: 0
    ev_losses, _ = eval_step(params, data)
    # train_step donates its state; run it after eval reads params
    state = TrainState(params, tx.init(params), jnp.asarray(0), jax.random.PRNGKey(0))
    _, tr_losses, _, _ = train_step(state, data)
    # both paths must see the in-forward value (2.0), not the cached 0.0
    assert float(np.mean(np.asarray(tr_losses["total"]))) == pytest.approx(2.0)
    assert float(np.mean(np.asarray(ev_losses["total"]))) == pytest.approx(2.0)


def test_cli_profile_and_log_capture(tiny_conf, tmp_path, monkeypatch):
    """--profile writes a device trace; the CLI tees stdout to log.txt
    (reference train.py:1014-1022,1408-1416)."""
    import gluefactory_tpu.train.trainer as tr

    conf_path = tmp_path / "tiny.yaml"
    tiny_conf.merge_({"train": {"profile_iters": 1}})
    tiny_conf.save(conf_path)
    monkeypatch.setattr(tr, "TRAINING_PATH", tmp_path)
    tr.main_cli(["exp_prof", "--conf", str(conf_path), "--profile"])
    out = tmp_path / "exp_prof"
    log = out / "log.txt"
    assert log.exists() and log.stat().st_size > 0
    prof_dir = out / "profile"
    assert prof_dir.exists()
    assert any(prof_dir.rglob("*.pb")) or any(prof_dir.rglob("*.trace.json.gz"))


def test_gt_figure_dump_flags(tiny_conf, tmp_path):
    """log_gt_pos_* one-time dumps produce figure files
    (reference train.py:86-94,771-848)."""
    from gluefactory_tpu.train.trainer import training

    tiny_conf.merge_(
        {
            "train": {
                "log_gt_pos_val_once": True,
                "log_gt_pos_neg_ign_val_once": True,
                "log_gt_pos_sparse_map_val_once": True,
                "log_gt_figures_n_pairs": 1,
            }
        }
    )
    out = tmp_path / "exp_gt_figs"
    training(tiny_conf, out)
    assert any((out / "gt_pos_val").glob("*.png"))
    assert any((out / "gt_pos_neg_ign_val").glob("*.png"))
    assert any((out / "gt_pos_sparse_map_val").glob("*.png"))


def test_do_evaluation_overlap_bins_and_tsv(tmp_path):
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.core.config import Config
    from gluefactory_tpu.parallel.mesh import make_mesh
    from gluefactory_tpu.train.trainer import do_evaluation

    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])

    def eval_step(params, data):
        m = jnp.asarray(data["overlap_0to1"], jnp.float32)
        return {"total": m}, {"match_recall": m * 2}

    loader = [
        {
            "overlap_0to1": np.array([0.2, 0.6]),
            "name": ["a/x_y", "a/y_z"],
            "idx": np.array([0, 1]),
        },
        {
            "overlap_0to1": np.array([0.8, 0.4]),
            "name": ["b/x_y", "b/y_z"],
            "idx": np.array([2, 3]),
        },
    ]
    conf = Config(
        {
            "median_metrics": [],
            "eval_overlap_bins": [[0.0, 0.5], [0.5, 1.0]],
            "log_metrics_path": "val_pairs.tsv",
        }
    )
    out = do_evaluation(eval_step, {}, loader, mesh, conf, step=7, log_dir=tmp_path)
    assert out["overlap_0.00_0.50/match_recall"] == pytest.approx((0.4 + 0.8) / 2)
    assert out["overlap_0.50_1.00/match_recall"] == pytest.approx((1.2 + 1.6) / 2)
    tsv = (tmp_path / "val_pairs.tsv").read_text().strip().splitlines()
    assert tsv[0].startswith("step\tindex\tname\toverlap")
    assert len(tsv) == 5
    assert tsv[1].split("\t")[:3] == ["7", "0", "a/x_y"]


def test_transfer_dtype_casts_images_only():
    import jax.numpy as jnp

    from gluefactory_tpu.parallel.mesh import make_mesh
    from gluefactory_tpu.train.trainer import prepare_batch

    import jax

    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    data = {
        "view0": {
            "image": np.random.rand(2, 8, 8, 1).astype(np.float32),
            "image_size": np.ones((2, 2), np.float32),
        },
        "gt_matches0": np.zeros((2, 4), np.int32),
    }
    out = prepare_batch(data, mesh, "bfloat16")
    assert out["view0"]["image"].dtype == jnp.bfloat16
    assert out["view0"]["image_size"].dtype == jnp.float32
    assert out["gt_matches0"].dtype == jnp.int32


def test_rss_watchdog_checkpoints_and_exits_75(tiny_conf, tmp_path):
    """max_host_rss_gb below the current RSS must stop the run after the
    first log interval with a saved checkpoint and exit code 75 (the
    restart contract of scripts/train_with_restarts.sh)."""
    from gluefactory_tpu.train.trainer import training

    tiny_conf["train"].merge_({"max_host_rss_gb": 0.001, "epochs": 3})
    out = tmp_path / "rss_exp"
    with pytest.raises(SystemExit) as e:
        training(tiny_conf, out)
    assert e.value.code == 75
    assert (out / "checkpoint_interrupted").exists()
