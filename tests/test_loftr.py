"""TPU-native LoFTR dense matcher: shapes, exact self-consistency of the
coarse matching, GT construction, and a train-from-scratch overfit smoke.

Reference surface: `gluefactory/models/matchers/kornia_loftr.py:7-60`
(kornia wrapper, inference-only); this implementation is from scratch and
additionally trainable (see module docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gluefactory_tpu.models import get_model

CONF = {
    "coarse_dim": 64,
    "fine_dim": 32,
    "backbone_dims": [8, 12, 16],
    "n_layers": 2,
    "heads": 4,
    "max_num_matches": 32,
    "conf_threshold": 0.0,
}


def _data(b=1, h=64, w=64, seed=0):
    rng = np.random.RandomState(seed)
    im0 = jnp.asarray(rng.rand(b, h, w, 1), jnp.float32)
    # identity-warp pair: view1 is view0 (H = I), the easiest GT
    return {
        "view0": {"image": im0},
        "view1": {"image": im0},
        "H_0to1": jnp.broadcast_to(jnp.eye(3), (b, 3, 3)),
    }


def test_forward_shapes_and_contract():
    model = get_model("matchers.loftr").from_conf(CONF)
    data = _data()
    params = model.init(jax.random.PRNGKey(0), data)
    pred = model.apply(params, data)
    K = CONF["max_num_matches"]
    assert pred["keypoints0"].shape == (1, K, 2)
    assert pred["keypoints1"].shape == (1, K, 2)
    assert pred["matching_scores0"].shape == (1, K)
    assert pred["keypoint_valid0"].dtype == bool
    # aligned-list contract of the reference wrapper: matches = arange | -1
    m = np.asarray(pred["matches0"][0])
    v = np.asarray(pred["keypoint_valid0"][0])
    assert (m[v] == np.arange(K)[v]).all() and (m[~v] == -1).all()
    # keypoints lie inside the image
    assert float(pred["keypoints0"].max()) < 64
    assert float(pred["keypoints0"].min()) >= 0


def test_identity_pair_is_diagonal():
    """On an identical image pair the mutual-NN coarse match of every
    selected cell must be the same cell (descriptors are equal)."""
    model = get_model("matchers.loftr").from_conf(CONF)
    data = _data()
    params = model.init(jax.random.PRNGKey(0), data)
    pred = model.apply(params, data)
    v = np.asarray(pred["keypoint_valid0"][0])
    p0 = np.asarray(pred["keypoints0"][0])[v]
    p1 = np.asarray(pred["keypoints1"][0])[v]
    assert v.sum() > 0
    # fine refinement can move pts1 by < 1 coarse cell; coarse cells agree
    np.testing.assert_allclose(p0, p1, atol=4.0)


def test_gt_coarse_identity_homography():
    model = get_model("matchers.loftr").from_conf(CONF)
    data = _data()
    bound = model.bind(model.init(jax.random.PRNGKey(0), data))
    j, warped, matched = bound._gt_coarse(data, 8, 8, 8, 8)
    assert j.shape == (1, 64)
    # identity homography: every cell matches itself
    assert bool(matched.all())
    np.testing.assert_array_equal(np.asarray(j[0]), np.arange(64))


def test_gt_coarse_shift_homography():
    model = get_model("matchers.loftr").from_conf(CONF)
    data = _data()
    # shift by exactly one coarse cell (8 px) in x
    H = jnp.asarray(
        [[1.0, 0.0, 8.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])[None]
    data["H_0to1"] = H
    bound = model.bind(model.init(jax.random.PRNGKey(0), data))
    j, warped, matched = bound._gt_coarse(data, 8, 8, 8, 8)
    lab = np.asarray(j[0]).reshape(8, 8)
    grid = np.arange(64).reshape(8, 8)
    # cells 0..6 map to their right neighbor; last column falls outside
    np.testing.assert_array_equal(lab[:, :7], grid[:, 1:])
    assert (lab[:, 7] == 64).all()  # unmatched sentinel


def test_loss_and_train_step_decreases():
    model = get_model("matchers.loftr").from_conf(CONF)
    data = _data()
    params = model.init(jax.random.PRNGKey(0), data)
    loss_fn = model.make_loss_fn()

    @jax.jit
    def step(params, opt_state):
        def scalar(p):
            pred = model.apply(p, data, train=True)
            losses, _ = loss_fn(pred, {**data, **pred})
            return jnp.mean(losses["total"]), losses

        (l, losses), g = jax.value_and_grad(scalar, has_aux=True)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, l

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    l0 = None
    for i in range(30):
        params, opt_state, l = step(params, opt_state)
        if l0 is None:
            l0 = float(l)
    assert np.isfinite(l0)
    assert float(l) < l0  # overfits the identity pair
    # the teacher-forced fine branch carries gradients from step 0
    pred = model.apply(params, data, train=True)
    losses, _ = loss_fn(pred, {**data, **pred})
    assert float(jnp.mean(losses["fine"])) > 0.0


def test_rectangular_images_and_jit():
    model = get_model("matchers.loftr").from_conf(CONF)
    rng = np.random.RandomState(1)
    data = {
        "view0": {"image": jnp.asarray(rng.rand(2, 48, 64, 1), jnp.float32)},
        "view1": {"image": jnp.asarray(rng.rand(2, 64, 48, 1), jnp.float32)},
    }
    params = model.init(jax.random.PRNGKey(0), data)
    pred = jax.jit(lambda p, d: model.apply(p, d))(params, data)
    assert pred["keypoints0"].shape == (2, CONF["max_num_matches"], 2)
    assert np.isfinite(np.asarray(pred["keypoints1"])).all()


def test_fine_window_gather_exact():
    """_gather_windows (one integer-patch gather + shifted bilinear slices)
    equals per-tap bilinear_gather on the offset grid, incl. edge clamping."""
    from gluefactory_tpu.models.extractors.aliked import bilinear_gather

    model = get_model("matchers.loftr").from_conf(CONF)
    data = _data()
    bound = model.bind(model.init(jax.random.PRNGKey(0), data))
    rng = np.random.RandomState(5)
    B, H, W, C, K, w = 2, 16, 20, 7, 11, 5
    fmap = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    r = w // 2
    dy, dx = jnp.mgrid[-r:r + 1, -r:r + 1].astype(jnp.float32)
    offs = jnp.stack([dx, dy], -1).reshape(-1, 2)

    # (1) fully-interior windows: tap-for-tap equal to bilinear_gather
    centers = jnp.asarray(
        r + 1 + rng.rand(B, K, 2) * [W - 2 * r - 3, H - 2 * r - 3],
        jnp.float32)
    got = bound._gather_windows(fmap, centers, w)
    grid = centers[:, :, None, :] + offs[None, None]
    ref = bilinear_gather(fmap, grid.reshape(B, K * w * w, 2)).reshape(
        B, K, w * w, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    # (2) border-straddling windows: true edge-clamp (both corners pinned),
    # checked against an explicit numpy reference
    centers = jnp.asarray(
        rng.rand(B, K, 2) * [W + 4, H + 4] - 2, jnp.float32)
    got = np.asarray(bound._gather_windows(fmap, centers, w))
    f = np.asarray(fmap)
    cn = np.asarray(centers)
    for bi in range(B):
        for ki in range(K):
            for ti, (ox, oy) in enumerate(np.asarray(offs)):
                x, y = cn[bi, ki, 0] + ox, cn[bi, ki, 1] + oy
                x0, y0 = np.floor(x), np.floor(y)
                wx, wy = x - x0, y - y0
                xi0 = int(np.clip(x0, 0, W - 1))
                xi1 = int(np.clip(x0 + 1, 0, W - 1))
                yi0 = int(np.clip(y0, 0, H - 1))
                yi1 = int(np.clip(y0 + 1, 0, H - 1))
                exp = (
                    f[bi, yi0, xi0] * (1 - wx) * (1 - wy)
                    + f[bi, yi0, xi1] * wx * (1 - wy)
                    + f[bi, yi1, xi0] * (1 - wx) * wy
                    + f[bi, yi1, xi1] * wx * wy)
                np.testing.assert_allclose(
                    got[bi, ki, ti], exp, atol=1e-4)


def test_log_space_selection():
    """coarse_select (log-space, never materializes P) returns the same
    argmaxes and max-confidence as the explicit dual-softmax matrix."""
    from gluefactory_tpu.models.matchers.loftr import coarse_select

    rng = np.random.RandomState(7)
    # well-separated random sims (no fp ties) incl. rectangular N != M
    for n, m in ((40, 40), (30, 50)):
        sim = jnp.asarray(rng.randn(3, n, m) * 3.0, jnp.float32)
        P = jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)
        j_ref = np.argmax(np.asarray(P), axis=2)
        i_ref = np.argmax(np.asarray(P), axis=1)
        conf_ref = np.max(np.asarray(P), axis=2)
        j, i, conf = coarse_select(sim)
        np.testing.assert_array_equal(np.asarray(j), j_ref)
        np.testing.assert_array_equal(np.asarray(i), i_ref)
        np.testing.assert_allclose(np.asarray(conf), conf_ref, rtol=2e-5)


def test_stack_coarse_and_fused_qkv_exact():
    """`stack_coarse` (both views through the coarse transformer as one 2B
    batch) and `fused_qkv` (one concatenated projection matmul) are pure
    runtime switches: same param tree, numerically matching outputs."""
    base = {**CONF, "stack_coarse": False, "fused_qkv": False}
    m_ref = get_model("matchers.loftr").from_conf(base)
    rng = np.random.RandomState(3)
    data = {
        "view0": {"image": jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32)},
        "view1": {"image": jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32)},
    }
    params = m_ref.init(jax.random.PRNGKey(0), data)
    ref = m_ref.apply(params, data)
    for extra in (
        {"fused_qkv": True},
        {"stack_coarse": True},
        {"stack_coarse": True, "fused_qkv": True},
    ):
        m = get_model("matchers.loftr").from_conf({**base, **extra})
        out = m.apply(params, data)
        np.testing.assert_allclose(
            np.asarray(out["keypoints1"]), np.asarray(ref["keypoints1"]),
            atol=1e-3, err_msg=str(extra))
        np.testing.assert_array_equal(
            np.asarray(out["matches0"]), np.asarray(ref["matches0"]),
            err_msg=str(extra))
        np.testing.assert_allclose(
            np.asarray(out["matching_scores0"]),
            np.asarray(ref["matching_scores0"]), atol=1e-4,
            err_msg=str(extra))


def test_stack_coarse_unequal_grids_exact():
    """The padded-token stacking path (rectangular pair, different grids)
    matches the unstacked reference exactly."""
    base = {**CONF, "stack_coarse": False, "fused_qkv": False}
    m_ref = get_model("matchers.loftr").from_conf(base)
    m_st = get_model("matchers.loftr").from_conf(
        {**CONF, "stack_coarse": True, "fused_qkv": True,
         "stack_backbone": False})
    rng = np.random.RandomState(4)
    data = {
        "view0": {"image": jnp.asarray(rng.rand(1, 48, 64, 1), jnp.float32)},
        "view1": {"image": jnp.asarray(rng.rand(1, 64, 48, 1), jnp.float32)},
    }
    params = m_ref.init(jax.random.PRNGKey(0), data)
    ref = m_ref.apply(params, data)
    out = m_st.apply(params, data)
    np.testing.assert_array_equal(
        np.asarray(out["matches0"]), np.asarray(ref["matches0"]))
    np.testing.assert_allclose(
        np.asarray(out["keypoints1"]), np.asarray(ref["keypoints1"]),
        atol=1e-3)


def test_bf16_matches_f32():
    """`dtype: bfloat16` is a compute-dtype switch (params stay f32): the
    coarse cell selection must agree with the f32 path on a clean identity
    pair, and refined points stay within a coarse cell of each other."""
    m32 = get_model("matchers.loftr").from_conf(CONF)
    m16 = get_model("matchers.loftr").from_conf({**CONF, "dtype": "bfloat16"})
    data = _data()
    params = m32.init(jax.random.PRNGKey(0), data)
    p32 = m32.apply(params, data)
    p16 = m16.apply(params, data)
    # untrained dual-softmax scores are diffuse, so tail ranks shuffle at
    # bf16 noise level — compare the top-8 (cell0 -> cell1) PAIRS as a set
    def top_pairs(p, n=8):
        order = np.argsort(-np.asarray(p["matching_scores0"][0]))[:n]
        k0 = np.asarray(p["keypoints0"][0])[order]
        k1 = np.asarray(p["keypoints1"][0])[order]
        cell1 = np.round((k1 + 0.5) / 8.0 - 0.5)
        return {(*map(float, a), *map(float, c)) for a, c in zip(k0, cell1)}

    s32, s16 = top_pairs(p32), top_pairs(p16)
    overlap = len(s32 & s16) / len(s32)
    assert overlap >= 0.75, (overlap, s32, s16)
