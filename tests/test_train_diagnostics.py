"""Trainer sanitizers: gradient-connectivity audit (`--detect_anomaly`) and
per-param gradient-norm stats (`train.log_grad_every_iter`).

Reference behavior: `gluefactory/train.py:1129-1138` (params without grads
raise under --detect_anomaly) and `train.py:1185-1199` (grad norms to TB).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


class _ToyModel:
    """Minimal BaseModel stand-in: y = w*x (+ dead*0), loss = mean(y^2)."""

    def __init__(self, with_dead_param=False):
        self.with_dead_param = with_dead_param

    def init_params(self):
        p = {"head": {"w": jnp.ones((4, 4))}}
        if self.with_dead_param:
            p["dead"] = {"b": jnp.ones((3,))}
        return {"params": p}

    def apply(self, params, data, train=False, rngs=None):
        y = data["x"] @ params["params"]["head"]["w"]
        return {"y": y}

    def make_loss_fn(self):
        def loss_fn(pred, data):
            per_sample = jnp.mean(pred["y"] ** 2, axis=tuple(range(1, pred["y"].ndim)))
            return {"total": per_sample}, {}

        return loss_fn


def _data(b=2):
    return {"x": jnp.asarray(np.random.RandomState(0).rand(b, 4), jnp.float32)}


def test_audit_raises_on_disconnected_param():
    from gluefactory_tpu.train.trainer import audit_gradient_connectivity

    model = _ToyModel(with_dead_param=True)
    with pytest.raises(RuntimeError, match="no gradient"):
        audit_gradient_connectivity(
            model, model.init_params(), _data(), jax.random.PRNGKey(0)
        )


def test_audit_passes_when_connected():
    from gluefactory_tpu.train.trainer import audit_gradient_connectivity

    model = _ToyModel(with_dead_param=False)
    dead = audit_gradient_connectivity(
        model, model.init_params(), _data(), jax.random.PRNGKey(0)
    )
    assert dead == []


def test_audit_ignores_frozen_submodels():
    from gluefactory_tpu.train.trainer import audit_gradient_connectivity

    model = _ToyModel(with_dead_param=True)
    # the "dead" root is declared frozen -> intentional, not an anomaly
    dead = audit_gradient_connectivity(
        model, model.init_params(), _data(), jax.random.PRNGKey(0),
        frozen_roots={"dead"},
    )
    assert dead == []


def test_train_step_reports_per_leaf_grad_norms():
    from gluefactory_tpu.parallel.mesh import make_mesh
    from gluefactory_tpu.train.trainer import TrainState, make_step_fns

    model = _ToyModel()
    tx = optax.sgd(0.1)
    params = model.init_params()
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    train_step, _, _ = make_step_fns(model, tx, mesh, want_grad_norms=True)
    state = TrainState(params, tx.init(params), jnp.asarray(0), jax.random.PRNGKey(0))
    _, _, _, stats = train_step(state, _data())
    norms = jax.device_get(stats["grad_norms"])
    assert set(norms) == {"params.head.w"}
    assert float(norms["params.head.w"]) > 0
    # matches the global norm for a single-leaf tree
    np.testing.assert_allclose(
        float(stats["grad_norm"]), float(norms["params.head.w"]), rtol=1e-5
    )


def test_frozen_submodels_helper():
    from gluefactory_tpu.core.config import Config
    from gluefactory_tpu.train.trainer import frozen_submodels

    conf = Config(
        {
            "name": "two_view_pipeline",
            "extractor": {"name": "superpoint", "trainable": False},
            "matcher": {"name": "lightglue"},
        }
    )
    assert frozen_submodels(conf) == {"extractor"}
