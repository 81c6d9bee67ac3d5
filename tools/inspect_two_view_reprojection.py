"""Check two-view reprojection consistency inside an Endomapper npz map.

Reference analogs: `tools/inspect_two_view_reprojection.py`,
`tools/test_colmap_correspondences.py`, and the dense-projection inspectors
— sanity tools that verify the stored poses/depths/intrinsics actually
reproject keypoints of one view onto their 3D-track partners in another.

For a map and a pair of image indices: unproject view-i keypoints with
their cached depths (KB4 or pinhole via `geometry.wrappers.Camera`),
transform with T_j @ T_i^-1, project into view j, and compare against
view-j's keypoints sharing the same `kp_p3d_ids`. Prints the error
distribution (a healthy map: median < 2 px) and flags broken pairs.

Usage:
  python -m tools.inspect_two_view_reprojection map.npz [--i 0 --j 1]
      [--all]  # scan every overlapping pair, report the worst
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def pair_reproj_errors(m, i: int, j: int):
    """Returns (errors_px, n_shared) for tracks visible in both views."""
    import jax.numpy as jnp

    from gluefactory_tpu.geometry.wrappers import Camera, Pose

    cam = Camera(
        size=jnp.asarray(m["camera_size"], jnp.float32),
        f=jnp.asarray(m["camera_f"], jnp.float32),
        c=jnp.asarray(m["camera_c"], jnp.float32),
        dist=jnp.asarray(m["camera_dist"][:4], jnp.float32),
        model="kb4"
        if str(m.get("camera_model", "OPENCV_FISHEYE")).upper().startswith(
            "OPENCV_FISH")
        else "pinhole",
    )
    kpi = np.asarray(m["keypoints"][i], np.float32).reshape(-1, 2)
    kpj = np.asarray(m["keypoints"][j], np.float32).reshape(-1, 2)
    di = np.asarray(m["kp_depths"][i], np.float32).reshape(-1)
    pi = np.asarray(m["kp_p3d_ids"][i], np.int64).reshape(-1)
    pj = np.asarray(m["kp_p3d_ids"][j], np.int64).reshape(-1)

    shared, ia, ja = np.intersect1d(
        pi[pi >= 0], pj[pj >= 0], return_indices=True)
    if len(shared) == 0:
        return np.zeros(0, np.float32), 0
    # indices back into the unfiltered arrays
    ia = np.flatnonzero(pi >= 0)[ia]
    ja = np.flatnonzero(pj >= 0)[ja]

    T_i = Pose.from_4x4mat(jnp.asarray(m["poses"][i]))
    T_j = Pose.from_4x4mat(jnp.asarray(m["poses"][j]))
    T_itoj = T_j @ T_i.inv()

    rays, v_un = cam.image2world(jnp.asarray(kpi[ia]))
    p3d_i = rays * jnp.asarray(di[ia])[:, None]
    p3d_j = T_itoj.transform(p3d_i)
    proj, v_pr = cam.world2image(p3d_j)
    err = np.linalg.norm(np.asarray(proj) - kpj[ja], axis=-1)
    ok = np.asarray(v_un & v_pr) & (di[ia] > 0)
    return err[ok].astype(np.float32), int(ok.sum())


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("npz", type=Path)
    ap.add_argument("--i", type=int, default=0)
    ap.add_argument("--j", type=int, default=1)
    ap.add_argument("--all", action="store_true",
                    help="scan all pairs with overlap > 0.1")
    ap.add_argument("--bad-px", type=float, default=5.0)
    args = ap.parse_args(argv)

    bad = 0
    with np.load(args.npz, allow_pickle=True) as m:
        if args.all:
            ov = np.asarray(m["overlap_matrix"], np.float32)
            n = ov.shape[0]
            pairs = [(i, j) for i in range(n) for j in range(i + 1, n)
                     if ov[i, j] > 0.1]
        else:
            pairs = [(args.i, args.j)]
        for i, j in pairs:
            err, n_shared = pair_reproj_errors(m, i, j)
            if n_shared == 0:
                print(f"({i},{j}): no shared tracks")
                continue
            med = float(np.median(err))
            line = (f"({i},{j}): {n_shared} shared tracks, median "
                    f"{med:.2f} px, p90 {np.percentile(err, 90):.2f} px")
            if med > args.bad_px:
                line += "  <-- BAD"
                bad += 1
            print(line)
    print(f"{bad} bad pairs" if bad else "all pairs consistent")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
