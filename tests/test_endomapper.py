"""Endomapper dataset + sparse GT test with a synthetic npz map fixture
(the reference pattern: `tests/test_endomapper_dataset.py:7-143`).
"""

import numpy as np
import pytest


N_IMGS = 6
N_PTS = 40
W, H = 320, 240


def _make_map(rng):
    """Synthetic KB4 map: 3D points seen by all cameras on a small arc."""
    import jax.numpy as jnp

    from gluefactory_tpu.geometry.wrappers import Camera, Pose

    cam = Camera(
        size=jnp.asarray([W, H], jnp.float32),
        f=jnp.asarray([200.0, 200.0]),
        c=jnp.asarray([W / 2, H / 2]),
        dist=jnp.asarray([0.05, -0.01, 0.002, -0.0004]),
        model="kb4",
    )
    p3d_w = rng.rand(N_PTS, 3) * [1.0, 0.8, 0.5] + [-0.5, -0.4, 1.5]
    names, poses, kpts, scores, depths, p3dids = [], [], [], [], [], []
    for i in range(N_IMGS):
        aa = np.array([0.0, 0.03 * i, 0.0])
        t = np.array([0.05 * i, 0.0, 0.0])
        T = Pose.from_aa(jnp.asarray(aa, jnp.float32), jnp.asarray(t, jnp.float32))
        p3d_c = np.asarray(T.transform(jnp.asarray(p3d_w, jnp.float32)))
        uv, valid = cam.world2image(jnp.asarray(p3d_c, jnp.float32)[None])
        uv = np.asarray(uv[0])
        valid = np.asarray(valid[0]) & np.asarray(cam.in_image(jnp.asarray(uv)[None])[0])
        names.append(f"frame_{i:04d}.png")
        poses.append(np.asarray(T.matrix(), np.float32))
        kpts.append(uv[valid].astype(np.float32))
        scores.append(rng.rand(valid.sum()).astype(np.float32))
        depths.append(p3d_c[valid, 2].astype(np.float32))
        p3dids.append(np.where(valid)[0].astype(np.int64))
    overlap = np.ones((N_IMGS, N_IMGS), np.float32)
    return {
        "image_names": np.array(names),
        "poses": np.stack(poses),
        "camera_size": np.array([W, H], np.float32),
        "camera_f": np.array([200.0, 200.0], np.float32),
        "camera_c": np.array([W / 2, H / 2], np.float32),
        "camera_dist": np.array([0.05, -0.01, 0.002, -0.0004], np.float32),
        "camera_model": "OPENCV_FISHEYE",
        "overlap_matrix": overlap,
        "keypoints": np.array(kpts, dtype=object),
        "scores": np.array(scores, dtype=object),
        "kp_depths": np.array(depths, dtype=object),
        "kp_p3d_ids": np.array(p3dids, dtype=object),
    }


@pytest.fixture(scope="module")
def endo_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    maps_dir = root / "endomapper" / "maps"
    maps_dir.mkdir(parents=True)
    rng = np.random.RandomState(3)
    np.savez(maps_dir / "seq01.npz", **_make_map(rng))
    return root


def test_endomapper_loader(endo_root, monkeypatch):
    import gluefactory_tpu.datasets.endomapper as em

    monkeypatch.setattr(em, "DATA_PATH", endo_root)
    from gluefactory_tpu.datasets import get_dataset

    ds = get_dataset("endomapper")(
        {"max_num_keypoints": 64, "num_per_map": 10, "batch_size": 2}
    )
    loader = ds.get_data_loader("train")
    batch = next(iter(loader))
    cache0 = batch["view0"]["cache"]
    assert cache0["keypoints"].shape == (2, 64, 2)
    assert cache0["keypoint_depths"].shape == (2, 64)
    assert batch["view0"]["camera"].model == "kb4"
    # pose roundtrip: T_0to1 @ T_1to0 = I (reference test `:106-143`)
    import jax.numpy as jnp

    T01 = batch["T_0to1"]
    T10 = batch["T_1to0"]
    I = np.asarray((T01 @ T10).matrix())
    np.testing.assert_allclose(I, np.broadcast_to(np.eye(4), I.shape), atol=1e-5)


def test_sparse_gt_from_map(endo_root, monkeypatch):
    import gluefactory_tpu.datasets.endomapper as em

    monkeypatch.setattr(em, "DATA_PATH", endo_root)
    import jax.numpy as jnp

    from gluefactory_tpu.datasets import get_dataset
    from gluefactory_tpu.geometry.gt_generation import gt_matches_from_sparse_map

    ds = get_dataset("endomapper")(
        {"max_num_keypoints": 64, "num_per_map": 5, "batch_size": 1}
    )
    batch = next(iter(ds.get_data_loader("train")))
    c0 = batch["view0"]["cache"]
    c1 = batch["view1"]["cache"]
    out = gt_matches_from_sparse_map(
        jnp.asarray(c0["keypoints"]),
        jnp.asarray(c1["keypoints"]),
        jnp.asarray(c0["keypoint_p3d_ids"]),
        jnp.asarray(c1["keypoint_p3d_ids"]),
        jnp.asarray(c0["keypoint_depths"]),
        jnp.asarray(c1["keypoint_depths"]),
        batch["view0"]["camera"],
        batch["view1"]["camera"],
        batch["T_0to1"],
        valid0=jnp.asarray(c0["keypoint_valid"]),
        valid1=jnp.asarray(c1["keypoint_valid"]),
    )
    m0 = np.asarray(out["gt_matches0"][0])
    ids0 = np.asarray(c0["keypoint_p3d_ids"][0])
    ids1 = np.asarray(c1["keypoint_p3d_ids"][0])
    pos = m0 >= 0
    assert pos.sum() > 10
    # every positive pairs identical 3D point ids
    np.testing.assert_array_equal(ids0[pos], ids1[m0[pos]])
    # reprojection consistency: positives should reproject close
    kp0_1 = np.asarray(out["gt_kp0_1"][0])
    kp1 = np.asarray(c1["keypoints"][0])
    d = np.linalg.norm(kp0_1[pos] - kp1[m0[pos]], axis=-1)
    assert np.median(d) < 2.0
