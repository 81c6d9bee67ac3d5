"""Cache dense pseudo-GT warps for EndomapperRoma training
(reference `tools/preprocess_endomapper_romaGT.py:1-475`).

For every sampled pair of an EndomapperDense map this writes
`<warps_dir>/<map>/<name0>_<name1>.npz` with `warp_0to1` (H, W, 2),
`certainty_0to1` (H, W) and `warp_1to0` — the cache format
`datasets/endomapper_roma.py` and `matchers/roma_gt_matcher.py` consume.

Two warp sources:
  - `--source depth` (default, runnable offline here): reproject every pixel
    with the dense depth + relative pose, certainty from forward-backward
    cycle consistency — geometry pseudo-GT, no learned matcher needed.
  - `--source h5 --h5-path warps.h5`: copy precomputed dense-matcher output
    (e.g. RoMa run elsewhere) stored as `<map>/<name0>_<name1>/{warp,certainty}`
    datasets into the npz cache layout.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def warp_from_depth(depth0, depth1, T_0to1, f, c, cycle_th=3.0):
    """Dense reprojection warp + cycle-consistency certainty (pinhole part;
    undistorted inputs assumed, like the reference's Undistorted_SfM)."""
    h, w = depth0.shape
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    z = depth0
    valid = z > 0
    X = np.stack(
        [(xs - c[0]) / f[0] * z, (ys - c[1]) / f[1] * z, z], -1
    )  # (H, W, 3)
    R, t = T_0to1[:3, :3], T_0to1[:3, 3]
    X1 = X @ R.T + t
    z1 = X1[..., 2]
    ok = valid & (z1 > 1e-6)
    u = X1[..., 0] / np.maximum(z1, 1e-6) * f[0] + c[0]
    v = X1[..., 1] / np.maximum(z1, 1e-6) * f[1] + c[1]
    inb = ok & (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)
    warp = np.stack([u, v], -1).astype(np.float32)

    # cycle: sample depth1 at (u, v), reproject back, compare
    ui = np.clip(np.round(u).astype(int), 0, w - 1)
    vi = np.clip(np.round(v).astype(int), 0, h - 1)
    z1s = depth1[vi, ui]
    consistent = inb & (z1s > 0) & (np.abs(z1s - z1) / np.maximum(z1, 1e-6) < 0.1)
    X1b = np.stack(
        [(u - c[0]) / f[0] * z1s, (v - c[1]) / f[1] * z1s, z1s], -1
    )
    Rb, tb = R.T, -R.T @ t
    X0b = X1b @ Rb.T + tb
    z0b = np.maximum(X0b[..., 2], 1e-6)
    ub = X0b[..., 0] / z0b * f[0] + c[0]
    vb = X0b[..., 1] / z0b * f[1] + c[1]
    err = np.sqrt((ub - xs) ** 2 + (vb - ys) ** 2)
    certainty = (consistent & (err < cycle_th)).astype(np.float32)
    return warp, certainty


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", type=Path, required=True, help="DATA_PATH root")
    ap.add_argument("--maps-dir", default="endomapper/maps")
    ap.add_argument("--images-dir", default="endomapper")
    ap.add_argument("--warps-dir", default="endomapper/roma_warps")
    ap.add_argument("--source", choices=["depth", "h5"], default="depth")
    ap.add_argument("--h5-path", type=Path, default=None)
    ap.add_argument("--min-overlap", type=float, default=0.3)
    ap.add_argument("--max-pairs-per-map", type=int, default=500)
    ap.add_argument("--cycle-th", type=float, default=3.0)
    args = ap.parse_args(argv)

    maps_dir = args.root / args.maps_dir
    out_root = args.root / args.warps_dir
    n_written = 0
    for map_path in sorted(maps_dir.glob("*.npz")):
        m = dict(np.load(map_path, allow_pickle=True))
        names = [str(n) for n in m["image_names"]]
        ov = m["overlap_matrix"]
        ii, jj = np.where(np.triu(ov >= args.min_overlap, k=1))
        pairs = list(zip(ii.tolist(), jj.tolist()))[: args.max_pairs_per_map]
        out_dir = out_root / map_path.stem
        out_dir.mkdir(parents=True, exist_ok=True)

        if args.source == "h5":
            import h5py

            with h5py.File(str(args.h5_path), "r") as fh:
                grp = fh.get(map_path.stem)
                if grp is None:
                    continue
                for i0, i1 in pairs:
                    key = f"{names[i0]}_{names[i1]}"
                    if key not in grp:
                        continue
                    g = grp[key]
                    np.savez_compressed(
                        out_dir / f"{key}.npz",
                        warp_0to1=np.asarray(g["warp"], np.float32),
                        certainty_0to1=np.asarray(g["certainty"], np.float32),
                    )
                    n_written += 1
            continue

        if "depth_paths" not in m or m["depth_paths"] is None:
            print(f"skip {map_path.stem}: no depth paths", file=sys.stderr)
            continue
        f = np.asarray(m["camera_f"], np.float64)
        c = np.asarray(m["camera_c"], np.float64)
        scales = m.get("depth_scale")

        def load_depth(idx):
            p = args.root / args.images_dir / str(m["depth_paths"][idx])
            if not p.exists():
                return None
            with np.load(str(p)) as d:
                depth = d["depth"].astype(np.float32)
                if "mask" in d:
                    depth = np.where(d["mask"].astype(bool), depth, 0.0)
            if scales is not None:
                depth = depth * float(np.asarray(scales)[idx])
            return depth

        for i0, i1 in pairs:
            d0, d1 = load_depth(i0), load_depth(i1)
            if d0 is None or d1 is None:
                continue
            T0 = np.asarray(m["poses"][i0], np.float64)
            T1 = np.asarray(m["poses"][i1], np.float64)
            T_0to1 = T1 @ np.linalg.inv(T0)
            w01, c01 = warp_from_depth(d0, d1, T_0to1, f, c, args.cycle_th)
            w10, _ = warp_from_depth(d1, d0, np.linalg.inv(T_0to1), f, c, args.cycle_th)
            np.savez_compressed(
                out_dir / f"{names[i0]}_{names[i1]}.npz",
                warp_0to1=w01,
                certainty_0to1=c01,
                warp_1to0=w10,
            )
            n_written += 1
    print(f"wrote {n_written} warp caches under {out_root}")
    return 0 if n_written else 1


if __name__ == "__main__":
    raise SystemExit(main())
