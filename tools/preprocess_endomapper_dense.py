"""Preprocess Endomapper sequences with dense depth into per-map npz caches
(reference `tools/preprocess_endomapper_dense.py:1-391`).

For each `<root>/<seq>/<map_id>/` holding COLMAP txt output plus dense-depth
npz files (`{depth, mask}` per frame, e.g. from a monocular depth network),
produces `scene_info/<seq>_<map_id>.npz` with:
  - image_names / image_paths / depth_paths / specular_mask_paths
  - poses (N, 4, 4) world->cam, camera intrinsics (KB4 f/c/dist)
  - overlap_matrix from shared 3D track ids
  - depth_scale (N,): per-image median ratio of COLMAP depth to dense depth
    at track keypoints (min-sample guarded; reference
    `preprocess_endomapper_dense.py:132-178`), so metric-ambiguous network
    depths align with the SfM scale at train time.

Usage:
  python tools/preprocess_endomapper_dense.py --root DATA/endomapper \
      --image-subpath images --depth-subpath depth --out scene_info
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gluefactory_tpu.datasets.endomapper_utils import (  # noqa: E402
    compute_overlap_matrix,
    read_cameras_txt,
    read_images_txt,
    read_points3D_txt,
)

MIN_SCALE_SAMPLES = 8


def bilinear_sample_depth(depth: np.ndarray, xy: np.ndarray):
    """Sample a dense depth map at subpixel keypoints; 0-depth = invalid."""
    h, w = depth.shape
    x, y = xy[:, 0], xy[:, 1]
    x0 = np.clip(np.floor(x).astype(int), 0, w - 1)
    y0 = np.clip(np.floor(y).astype(int), 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    wx, wy = x - x0, y - y0
    corners = np.stack(
        [depth[y0, x0], depth[y0, x1], depth[y1, x0], depth[y1, x1]], -1
    )
    weights = np.stack(
        [(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy], -1
    )
    ok = np.all(corners > 0, -1) & (x >= 0) & (y >= 0) & (x <= w - 1) & (y <= h - 1)
    return np.sum(corners * weights, -1), ok


def depth_scale_for_image(img_rec, points3d, T_w2c, depth_path: Path):
    """Median COLMAP-z / dense-depth ratio at triangulated keypoints."""
    if not depth_path.exists():
        return 1.0, 0
    pids = np.asarray(img_rec["point3D_ids"], np.int64)
    xys = np.asarray(img_rec["xys"], np.float32)
    keep = pids >= 0
    pids, xys = pids[keep], xys[keep]
    present = np.array([int(p) in points3d for p in pids], bool)
    if not present.any():
        return 1.0, 0
    pids, xys = pids[present], xys[present]
    xyz = np.stack([points3d[int(p)] for p in pids]).astype(np.float32)

    with np.load(str(depth_path)) as d:
        depth = d["depth"].astype(np.float32)
        if "mask" in d:
            depth = np.where(d["mask"].astype(bool), depth, 0.0)
    dvals, ok = bilinear_sample_depth(depth, xys)
    z = (xyz @ T_w2c[:3, :3].T)[:, 2] + T_w2c[2, 3]
    good = ok & np.isfinite(dvals) & (dvals > 0) & np.isfinite(z) & (z > 1e-6)
    n = int(good.sum())
    if n < MIN_SCALE_SAMPLES:
        return 1.0, n
    scale = float(np.median(z[good] / dvals[good]))
    if not np.isfinite(scale) or scale <= 0:
        return 1.0, n
    return scale, n


def qvec_to_rotmat(q):
    """COLMAP (w, x, y, z) quaternion -> rotation matrix."""
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _pose_w2c(img_rec):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = qvec_to_rotmat(np.asarray(img_rec["qvec"], np.float64))
    T[:3, 3] = np.asarray(img_rec["tvec"], np.float64)
    return T


def _split_camera(cam):
    """COLMAP camera params -> (f, c, dist) for PINHOLE/OPENCV/OPENCV_FISHEYE."""
    p = np.asarray(cam["params"], np.float64)
    model = cam["model"].upper()
    if model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL"):
        f = np.array([p[0], p[0]])
        c = p[1:3]
        dist = p[3:7] if len(p) > 3 else np.zeros(4)
    else:  # PINHOLE / OPENCV / OPENCV_FISHEYE: fx fy cx cy [d...]
        f = p[0:2]
        c = p[2:4]
        dist = p[4:8] if len(p) > 4 else np.zeros(4)
    dist = np.pad(dist, (0, max(0, 4 - len(dist))))[:4]
    return f, c, dist


def process_map(root: Path, seq: str, map_id: str, args) -> dict:
    mdir = root / seq / map_id
    cams = read_cameras_txt(mdir / "cameras.txt")
    images = read_images_txt(mdir / "images.txt")
    pts = read_points3D_txt(mdir / "points3D.txt")
    points3d = {int(pid): np.asarray(p["xyz"], np.float32) for pid, p in pts.items()}

    ids = sorted(images.keys())
    names = [images[i]["name"] for i in ids]
    poses = np.stack([_pose_w2c(images[i]) for i in ids]).astype(np.float32)
    cam = cams[images[ids[0]]["camera_id"]]
    cam_f, cam_c, cam_dist = _split_camera(cam)

    image_paths = [f"{args.image_subpath}/{seq}/{map_id}/{Path(n).name}" for n in names]
    depth_paths = [
        f"{args.depth_subpath}/{seq}/{map_id}/{Path(n).stem}{args.depth_suffix}"
        for n in names
    ]
    spec_paths = [
        f"{args.specular_subpath}/{seq}/{map_id}/{Path(n).stem}{args.specular_suffix}"
        for n in names
    ]

    overlap = compute_overlap_matrix({i: images[i] for i in ids})

    scales = np.ones(len(ids), np.float32)
    n_samples = np.zeros(len(ids), np.int32)
    for k, i in enumerate(ids):
        scales[k], n_samples[k] = depth_scale_for_image(
            images[i], points3d, poses[k], root / depth_paths[k]
        )

    return {
        "seq": seq,
        "map_id": map_id,
        "image_names": np.array([Path(n).stem for n in names], object),
        "image_paths": np.array(image_paths, object),
        "depth_paths": np.array(depth_paths, object),
        "specular_mask_paths": np.array(spec_paths, object),
        "poses": poses,
        "camera_size": np.array([cam["width"], cam["height"]], np.float32),
        "camera_f": cam_f.astype(np.float32),
        "camera_c": cam_c.astype(np.float32),
        "camera_dist": cam_dist.astype(np.float32),
        "camera_model": str(cam.get("model", "OPENCV_FISHEYE")),
        "overlap_matrix": overlap.astype(np.float32),
        "depth_scale": scales,
        "depth_scale_num_samples": n_samples,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", type=Path, required=True)
    ap.add_argument("--out", type=Path, default=None)
    ap.add_argument("--seqs", nargs="*", default=None)
    ap.add_argument("--image-subpath", default="images")
    ap.add_argument("--depth-subpath", default="depth")
    ap.add_argument("--specular-subpath", default="specular")
    ap.add_argument("--depth-suffix", default="_ttr.npz")
    ap.add_argument("--specular-suffix", default="_spec.npz")
    args = ap.parse_args(argv)

    root = args.root
    out = args.out or (root / "maps")
    out.mkdir(parents=True, exist_ok=True)

    seqs = args.seqs or sorted(
        p.name for p in root.iterdir() if p.is_dir() and p.name not in ("maps",)
    )
    written = []
    for seq in seqs:
        for mdir in sorted((root / seq).iterdir()):
            if not (mdir / "images.txt").exists():
                continue
            info = process_map(root, seq, mdir.name, args)
            path = out / f"{seq}_{mdir.name}.npz"
            np.savez_compressed(path, **info)
            written.append(path)
            print(f"wrote {path} ({len(info['image_names'])} frames)")
    if not written:
        print("no COLMAP maps found", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
