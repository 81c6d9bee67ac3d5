"""Endomapper/COLMAP map utilities
(reference `gluefactory/datasets/endomapper_utils.py:74-385`).

COLMAP text parsing (cameras/images/points3D), overlap-matrix computation
from shared 3D points, and specular-highlight mask computation for
endoscopic frames.
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np


def read_cameras_txt(path) -> dict:
    """COLMAP cameras.txt -> {camera_id: dict} (reference `:74-90`)."""
    cameras = {}
    for line in Path(path).read_text().splitlines():
        if line.startswith("#") or not line.strip():
            continue
        parts = line.split()
        cam_id, model = int(parts[0]), parts[1]
        w, h = int(parts[2]), int(parts[3])
        params = np.array(list(map(float, parts[4:])), np.float64)
        cameras[cam_id] = {"model": model, "width": w, "height": h, "params": params}
    return cameras


def read_images_txt(path) -> dict:
    """COLMAP images.txt -> {image_id: {name, qvec, tvec, camera_id, xys,
    point3D_ids}} (reference `:91-131`)."""
    images = {}
    lines = [
        l for l in Path(path).read_text().splitlines() if l.strip() and not l.startswith("#")
    ]
    for i in range(0, len(lines), 2):
        parts = lines[i].split()
        image_id = int(parts[0])
        qvec = np.array(list(map(float, parts[1:5])))
        tvec = np.array(list(map(float, parts[5:8])))
        camera_id = int(parts[8])
        name = parts[9]
        elems = lines[i + 1].split()
        xys = np.array(elems, np.float64).reshape(-1, 3)[:, :2] if elems else np.zeros((0, 2))
        p3d_ids = (
            np.array(elems, np.float64).reshape(-1, 3)[:, 2].astype(np.int64)
            if elems
            else np.zeros(0, np.int64)
        )
        images[image_id] = {
            "name": name,
            "qvec": qvec,
            "tvec": tvec,
            "camera_id": camera_id,
            "xys": xys,
            "point3D_ids": p3d_ids,
        }
    return images


def read_points3D_txt(path) -> dict:
    """COLMAP points3D.txt -> {point_id: {xyz, error, track}} (reference `:132-160`)."""
    points = {}
    for line in Path(path).read_text().splitlines():
        if line.startswith("#") or not line.strip():
            continue
        parts = line.split()
        pid = int(parts[0])
        xyz = np.array(list(map(float, parts[1:4])))
        error = float(parts[7])
        track = np.array(list(map(int, parts[8:]))).reshape(-1, 2)
        points[pid] = {"xyz": xyz, "error": error, "track": track}
    return points


def compute_overlap_matrix(images: dict) -> np.ndarray:
    """Pairwise fraction of shared 3D points (reference `:309-336`)."""
    ids = sorted(images.keys())
    sets = [
        set(images[i]["point3D_ids"][images[i]["point3D_ids"] >= 0].tolist())
        for i in ids
    ]
    n = len(ids)
    overlap = np.zeros((n, n), np.float32)
    for a in range(n):
        for b in range(a + 1, n):
            if not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            overlap[a, b] = overlap[b, a] = inter / min(len(sets[a]), len(sets[b]))
    return overlap


def compute_specular_mask(
    image: np.ndarray, brightness_th: float = 0.85, dilate_px: int = 5
) -> np.ndarray:
    """True where endoscope specular highlights saturate the image
    (reference `:337-385`). image: float (H, W, C) in [0,1]."""
    gray = image.mean(-1) if image.ndim == 3 else image
    mask = (gray > brightness_th).astype(np.uint8)
    if dilate_px > 0:
        kernel = cv2.getStructuringElement(
            cv2.MORPH_ELLIPSE, (2 * dilate_px + 1, 2 * dilate_px + 1)
        )
        mask = cv2.dilate(mask, kernel)
    return mask.astype(bool)


def colmap_map_to_npz(
    sparse_dir: Path,
    out_path: Path,
    max_kpts: int | None = None,
):
    """Convert a COLMAP text map into the framework's npz map format
    (the offline tool analog of `tools/preprocess_endomapper.py`).

    npz schema (documented contract for `datasets/endomapper.py`):
      image_names (N,) str; poses (N, 4, 4) world->cam; camera_{size,f,c,dist};
      overlap_matrix (N, N); object arrays per image: keypoints, scores,
      kp_depths (z in the camera), kp_p3d_ids; optional descriptors.
    """
    cameras = read_cameras_txt(sparse_dir / "cameras.txt")
    images = read_images_txt(sparse_dir / "images.txt")
    points = read_points3D_txt(sparse_dir / "points3D.txt")
    ids = sorted(images.keys())

    from ..geometry.wrappers import Pose

    names, poses, kpts, scores, depths, p3dids = [], [], [], [], [], []
    for i in ids:
        im = images[i]
        T = np.asarray(
            Pose.from_colmap(im["qvec"], im["tvec"]).matrix(), np.float64
        )
        names.append(im["name"])
        poses.append(T.astype(np.float32))
        sel = im["point3D_ids"] >= 0
        xy = im["xys"][sel]
        pid = im["point3D_ids"][sel]
        z = np.array(
            [
                (T[:3, :3] @ points[p]["xyz"] + T[:3, 3])[2] if p in points else 0.0
                for p in pid
            ],
            np.float32,
        )
        if max_kpts and len(xy) > max_kpts:
            keep = np.argsort(-z)[:max_kpts]
            xy, pid, z = xy[keep], pid[keep], z[keep]
        kpts.append(xy.astype(np.float32))
        scores.append(np.ones(len(xy), np.float32))
        depths.append(z)
        p3dids.append(pid.astype(np.int64))

    cam0 = cameras[images[ids[0]]["camera_id"]]
    params = cam0["params"]
    if cam0["model"] in ("OPENCV_FISHEYE",):
        f = params[0:2]
        c = params[2:4]
        dist = params[4:8]
    elif cam0["model"] in ("PINHOLE",):
        f, c, dist = params[0:2], params[2:4], np.zeros(4)
    else:
        f = np.array([params[0], params[0]])
        c = params[1:3]
        dist = np.zeros(4)

    np.savez(
        out_path,
        image_names=np.array(names),
        poses=np.stack(poses),
        camera_size=np.array([cam0["width"], cam0["height"]], np.float32),
        camera_f=np.asarray(f, np.float32),
        camera_c=np.asarray(c, np.float32),
        camera_dist=np.asarray(dist, np.float32),
        camera_model=cam0["model"],
        overlap_matrix=compute_overlap_matrix(images),
        keypoints=np.array(kpts, dtype=object),
        scores=np.array(scores, dtype=object),
        kp_depths=np.array(depths, dtype=object),
        kp_p3d_ids=np.array(p3dids, dtype=object),
        allow_pickle=True,
    )
    return out_path
