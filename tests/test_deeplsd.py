"""From-scratch DeepLSD: the native guided-LSD extractor recovers known
segments from analytic distance/angle fields, the flax model runs fixed-shape
under jit with the reference wrapper's output conventions, and the DF/AF
fields train (the reference `models/lines/deeplsd.py:9-106` is an
inference-only wrapper around an external package)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.models import get_model
from gluefactory_tpu.models.lines.deeplsd import (
    extract_lines_host,
    lines_to_df_angle,
)

# non-crossing segments: region growing splits at intersections (like LSD)
SEGS = np.asarray(
    [
        [[20.0, 20.0], [140.0, 20.0]],   # horizontal
        [[40.0, 110.0], [40.0, 50.0]],   # vertical
        [[70.0, 60.0], [130.0, 100.0]],  # diagonal
    ],
    np.float32,
)


def _fields(h=120, w=160, tau=5.0):
    df, ang = lines_to_df_angle(
        jnp.asarray(SEGS), jnp.ones(len(SEGS), bool), h, w
    )
    return np.exp(-np.asarray(df) / tau), np.asarray(ang)


def _endpoint_err(seg, gt):
    d1 = np.linalg.norm(seg[0] - gt[0]) + np.linalg.norm(seg[1] - gt[1])
    d2 = np.linalg.norm(seg[0] - gt[1]) + np.linalg.norm(seg[1] - gt[0])
    return min(d1, d2) / 2


def test_native_extraction_recovers_segments():
    p, ang = _fields()
    lines, lengths, valid = extract_lines_host(
        p, ang, max_lines=50, mag_thresh=0.4, ang_tol=0.3927,
        min_density=0.4, min_size=15,
    )
    found = lines[valid]
    assert len(found) >= 3
    for gt in SEGS:
        errs = [_endpoint_err(seg, gt) for seg in found]
        assert min(errs) < 4.0, (gt, found[np.argmin(errs)], min(errs))


def test_lines_to_df_angle_values():
    df, ang = lines_to_df_angle(
        jnp.asarray(SEGS), jnp.ones(len(SEGS), bool), 120, 160
    )
    # a pixel on the horizontal segment: zero-ish distance, angle ~ 0
    assert float(df[20, 80]) < 1.0
    assert float(ang[20, 80]) < 0.05
    # a pixel on the vertical segment: angle ~ pi/2
    assert abs(float(ang[80, 40]) - np.pi / 2) < 0.05
    # far corner: large distance
    assert float(df[115, 155]) > 20.0


@pytest.fixture(scope="module")
def tiny_model():
    model = get_model("lines.deeplsd").from_conf(
        {"base_ch": 8, "max_num_lines": 32, "min_length": 10}
    )
    img = jnp.asarray(np.random.RandomState(0).rand(2, 48, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), {"image": img}, train=True)
    return model, variables, img


def test_forward_fixed_shapes(tiny_model):
    model, variables, img = tiny_model
    out = jax.jit(lambda v, d: model.apply(v, d, train=False))(
        variables, {"image": img}
    )
    assert out["lines"].shape == (2, 32, 2, 2)
    assert out["line_scores"].shape == (2, 32)
    assert out["valid_lines"].shape == (2, 32)
    assert out["df_proximity"].shape == (2, 48, 64)
    # scores are sqrt(length) for valid lines, 0 for padding
    v = np.asarray(out["valid_lines"])
    s = np.asarray(out["line_scores"])
    assert np.all(s[~v] == 0)
    if v.any():
        lens = np.linalg.norm(
            np.asarray(out["lines"])[..., 0, :] - np.asarray(out["lines"])[..., 1, :],
            axis=-1,
        )
        np.testing.assert_allclose(s[v], np.sqrt(lens[v]), rtol=0.2)


def test_fields_train(tiny_model):
    import optax

    model, variables, img = tiny_model
    h, w = img.shape[1:3]
    df, ang = lines_to_df_angle(
        jnp.asarray(SEGS) * 0.3, jnp.ones(len(SEGS), bool), h, w
    )
    data = {
        "image": img,
        "gt_df": jnp.broadcast_to(df, (2, h, w)),
        "gt_angle": jnp.broadcast_to(ang, (2, h, w)),
    }

    def loss_fn(params):
        pred = model.apply({"params": params}, data, train=True)
        losses, _ = model.loss(pred, data)
        return jnp.mean(losses["total"])

    tx = optax.adam(3e-3)
    params = variables["params"]
    state = tx.init(params)
    l0 = float(loss_fn(params))
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    for _ in range(10):
        l, g = grad_fn(params)
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    l1 = float(loss_fn(params))
    assert np.isfinite(l0) and np.isfinite(l1) and l1 < l0
