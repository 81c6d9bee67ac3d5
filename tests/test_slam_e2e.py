"""End-to-end mini-SLAM: rendered image sequence -> extractor+matcher ->
essential LO-RANSAC -> chained trajectory -> ATE vs ground truth.

The north-star integration (BASELINE.json: "match the reference's
trajectories within its ATE bound"): every stage is the framework's own —
SIFT front-end (works untrained), NN matcher, batched 5-point RANSAC
(`sfm/odometry.py`), pose chaining and Umeyama ATE. The scene is a
rendered two-plane world (textured background + closer foreground quad)
so there is real parallax and the essential geometry is well-posed.
"""

import cv2
import numpy as np
import pytest

W, H = 320, 240
K = np.array([[260.0, 0, W / 2], [0, 260.0, H / 2], [0, 0, 1]], np.float64)
F = 5  # frames


def _plane_homography(Rw2c, t_w2c, n, d, K):
    """World plane {x: n.x = d} -> image homography from the plane's texture
    frame. We parameterize the texture frame by two in-plane axes."""
    # orthonormal basis of the plane
    a = np.array([1.0, 0, 0]) if abs(n[0]) < 0.9 else np.array([0, 1.0, 0])
    u = np.cross(n, a); u /= np.linalg.norm(u)
    v = np.cross(n, u)
    origin = n * d  # point on the plane
    # texture (s, t) -> world -> camera -> image
    M = np.stack([u, v, origin], axis=1)  # world = M @ [s, t, 1]
    P = K @ np.hstack([Rw2c, t_w2c[:, None]])  # 3x4
    Hmat = P @ np.vstack([M, [0, 0, 1]])
    return Hmat


def _render(tex_bg, tex_fg, Rw2c, t_w2c):
    """Composite two textured planes (bg z=2 plane, fg patch at z=1.2)."""
    S = 2.0  # texture scale: 1 texture px = 1/160 world units
    def warp(tex, n, d, offset):
        Hm = _plane_homography(Rw2c, t_w2c, n, d, K)
        # texture pixel -> plane coords (centered, scaled)
        T = np.array([[S / tex.shape[1], 0, -S / 2 + offset[0]],
                      [0, S / tex.shape[0], -S / 2 + offset[1]],
                      [0, 0, 1.0]])
        return cv2.warpPerspective(
            tex, Hm @ T, (W, H), flags=cv2.INTER_LINEAR)

    n = np.array([0.0, 0, 1.0])
    bg = warp(tex_bg, n, 2.0, (0.0, 0.0))
    fg = warp(tex_fg, n, 1.2, (0.45, 0.35))
    mask = warp(np.ones_like(tex_fg), n, 1.2, (0.45, 0.35)) > 0.5
    out = np.where(mask, fg, bg)
    return out.astype(np.float32)


@pytest.fixture(scope="module")
def sequence():
    from gluefactory_tpu.datasets.homographies import generate_synthetic_image

    rng = np.random.RandomState(3)
    tex_bg = np.mean(generate_synthetic_image(rng, 480, 480), -1)
    tex_fg = np.mean(generate_synthetic_image(rng, 160, 160), -1)
    tex_fg = cv2.resize(tex_fg, (120, 120))
    Rs, ts, imgs = [], [], []
    for i in range(F):
        ang = 0.02 * i
        Rw2c, _ = cv2.Rodrigues(np.array([0.0, ang, 0.0]))
        t_c = np.array([-0.06 * i, 0.01 * i, 0.0])  # camera translates in x
        t_w2c = -Rw2c @ t_c
        Rs.append(Rw2c)
        ts.append(t_w2c)
        imgs.append(_render(tex_bg, tex_fg, Rw2c, t_w2c))
    return np.stack(imgs), np.stack(Rs), np.stack(ts)


def test_images_to_trajectory_ate(sequence):
    import jax
    import jax.numpy as jnp

    from gluefactory_tpu.geometry.wrappers import Camera
    from gluefactory_tpu.models import get_model
    from gluefactory_tpu.robust_estimators.relative_pose.device_two_view import (
        DeviceTwoViewEstimator,
    )
    from gluefactory_tpu.sfm.odometry import chain_poses, trajectory_ate

    imgs, Rs_gt, ts_gt = sequence
    model = get_model("two_view_pipeline").from_conf({
        "extractor": {"name": "sift", "max_num_keypoints": 512},
        "matcher": {"name": "nearest_neighbor", "ratio_thresh": 0.9,
                    "mutual_check": True},
    })
    batch = jnp.asarray(imgs)[..., None]
    data = {
        "view0": {"image": batch[:-1]},
        "view1": {"image": batch[1:]},
    }
    params = model.init(jax.random.PRNGKey(0), data, train=False)
    pred = jax.device_get(model.apply(params, data, train=False))

    k0 = np.asarray(pred["keypoints0"])     # (E, N, 2)
    k1 = np.asarray(pred["keypoints1"])
    m0 = np.asarray(pred["matches0"])       # (E, N)
    E, N = m0.shape
    # aligned matched pairs, fixed-shape with validity
    idx = np.where(m0 >= 0, m0, 0)
    p0 = k0
    p1 = np.take_along_axis(k1, idx[..., None], axis=1)
    valid = m0 >= 0
    assert valid.sum(1).min() > 25, "front-end failed to match the renders"

    # per-edge relative pose via the two-view model-selection estimator:
    # the background plane dominates many edges, where a blind essential
    # fit is degenerate — H/E selection (COLMAP-style) handles it
    cam = Camera.from_calibration_matrix(jnp.asarray(K, jnp.float32))
    estimator = DeviceTwoViewEstimator({"ransac_th": 1.5})
    R_rel, t_rel, configs = [], [], []
    for e in range(E):
        out = estimator({
            "m_kpts0": jnp.asarray(p0[e], jnp.float32),
            "m_kpts1": jnp.asarray(p1[e], jnp.float32),
            "match_valid": jnp.asarray(valid[e]),
            "camera0": cam,
            "camera1": cam,
        })
        assert bool(out["success"])
        R_rel.append(np.asarray(out["M_0to1"].R))
        t_rel.append(np.asarray(out["M_0to1"].t))
        configs.append(out["type"])
    R_rel = np.stack(R_rel)
    t_rel = np.stack(t_rel)
    # the renders are plane-dominated: model selection must engage
    assert set(configs) <= {"CALIBRATED", "PLANAR"}, configs

    # rotation accuracy per edge
    for e in range(E):
        R_gt = Rs_gt[e + 1] @ Rs_gt[e].T
        cosang = (np.trace(R_rel[e].T @ R_gt) - 1) / 2
        assert np.degrees(np.arccos(np.clip(cosang, -1, 1))) < 2.0

    # monocular scale per edge is unobservable: take |t| from GT (the
    # standard odometry-evaluation protocol), direction from the estimate
    scales = np.asarray(
        [np.linalg.norm(ts_gt[e + 1] - (Rs_gt[e + 1] @ Rs_gt[e].T) @ ts_gt[e])
         for e in range(E)], np.float32)
    Rs_est, ts_est = chain_poses(
        jnp.asarray(R_rel, jnp.float32), jnp.asarray(t_rel, jnp.float32),
        scales=jnp.asarray(scales))

    ate, _ = trajectory_ate(
        np.asarray(Rs_est), np.asarray(ts_est),
        Rs_gt.astype(np.float32), ts_gt.astype(np.float32))
    # GT camera centers span ~0.25 world units; the ATE bound is 5% of that
    assert float(ate) < 0.015, f"ATE {float(ate)} too large"
