"""SIFT extractor (reference `gluefactory/models/extractors/sift.py:97-466`).

Backend "opencv": host cv2.SIFT bridged into the jitted pipeline via
`jax.pure_callback` with fixed-K padded outputs, so SIFT pipelines still
compile into one XLA program (the host call is the only sync point, exactly
like the reference's pycolmap/CudaSift external calls, SURVEY.md §2.9).
RootSIFT normalization matches `sift_to_rootsift` (`sift.py:65`).

A future Pallas DoG pyramid can replace the host backend without touching
the interface (same pred-dict contract).
"""

from __future__ import annotations

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..base_model import BaseModel

__main_class__ = "SIFT"


def sift_to_rootsift(desc: np.ndarray, eps=1e-8) -> np.ndarray:
    """L1-normalize -> sqrt -> L2-normalize (reference `sift.py:65-77`)."""
    desc = desc / np.maximum(np.linalg.norm(desc, ord=1, axis=-1, keepdims=True), eps)
    desc = np.sqrt(np.maximum(desc, 0.0))
    return desc / np.maximum(np.linalg.norm(desc, axis=-1, keepdims=True), eps)


def run_opencv_sift(sift, img_u8: np.ndarray, k: int):
    """Detect+describe one grayscale uint8 image, pad/truncate to k."""
    kpts_cv, desc = sift.detectAndCompute(img_u8, None)
    n = len(kpts_cv)
    kpts = np.zeros((k, 2), np.float32)
    scales = np.zeros((k,), np.float32)
    oris = np.zeros((k,), np.float32)
    scores = np.zeros((k,), np.float32)
    descs = np.zeros((k, 128), np.float32)
    valid = np.zeros((k,), bool)
    if n > 0:
        pts = np.array([kp.pt for kp in kpts_cv], np.float32)
        sz = np.array([kp.size for kp in kpts_cv], np.float32)
        an = np.array([kp.angle for kp in kpts_cv], np.float32)
        rs = np.array([kp.response for kp in kpts_cv], np.float32)
        order = np.argsort(-rs)[:k]
        m = len(order)
        kpts[:m] = pts[order]
        scales[:m] = sz[order]
        oris[:m] = np.deg2rad(an[order])
        scores[:m] = rs[order]
        descs[:m] = sift_to_rootsift(desc[order].astype(np.float32))
        valid[:m] = True
    return kpts, scores, scales, oris, descs, valid


class SIFT(BaseModel):
    default_conf = {
        "backend": "opencv",  # future: "pallas_dog"
        "max_num_keypoints": 2048,
        "detection_threshold": 0.0066667,  # OpenCV contrastThreshold
        "edge_threshold": 10,
        "first_octave": -1,
        "num_octaves": 4,
        "rootsift": True,
    }
    required_data_keys = ("image",)

    def setup(self):
        pass

    @property
    def _sift(self):
        return cv2.SIFT_create(
            contrastThreshold=float(self.conf.detection_threshold),
            nfeatures=int(self.conf.max_num_keypoints),
            edgeThreshold=int(self.conf.edge_threshold),
            nOctaveLayers=3,
        )

    def _forward(self, data: dict, train: bool = False) -> dict:
        image = data["image"]  # (B, H, W, C)
        if image.shape[-1] == 3:
            scale = jnp.asarray([0.299, 0.587, 0.114], image.dtype)
            image = jnp.sum(image * scale, axis=-1, keepdims=True)
        B, H, W, _ = image.shape
        k = int(self.conf.max_num_keypoints)
        conf = self.conf

        if conf.backend == "device":
            # fully on-device DoG pyramid (CudaSift-equivalent fast path,
            # `ops/sift_device.py`) — no host round-trip, pure XLA
            from ...ops.sift_device import detect_sift_device

            pred = detect_sift_device(
                image[..., 0],
                max_num_keypoints=k,
                num_octaves=int(conf.num_octaves),
                contrast_th=float(conf.detection_threshold),
                edge_th=float(conf.edge_threshold),
            )
            if conf.rootsift:
                d = pred["descriptors"]
                d = d / jnp.maximum(
                    jnp.sum(jnp.abs(d), axis=-1, keepdims=True), 1e-8
                )
                d = jnp.sqrt(jnp.maximum(d, 0.0))
                d = d / jnp.maximum(
                    jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8
                )
                pred["descriptors"] = d
            valid = pred["keypoint_valid"]
            if "image_size" in data:
                inside = jnp.all(
                    pred["keypoints"] < data["image_size"][:, None, :], axis=-1
                )
                valid = valid & inside
            pred["keypoint_valid"] = valid
            pred["descriptors"] = jnp.where(
                valid[..., None], pred["descriptors"], 0.0
            )
            return pred

        def host_fn(imgs):
            sift = cv2.SIFT_create(
                contrastThreshold=float(conf.detection_threshold),
                nfeatures=k,
                edgeThreshold=int(conf.edge_threshold),
            )
            outs = [
                run_opencv_sift(
                    sift, (np.asarray(im[..., 0]) * 255).astype(np.uint8), k
                )
                for im in imgs
            ]
            return tuple(np.stack([o[i] for o in outs]) for i in range(6))

        result_shapes = (
            jax.ShapeDtypeStruct((B, k, 2), jnp.float32),
            jax.ShapeDtypeStruct((B, k), jnp.float32),
            jax.ShapeDtypeStruct((B, k), jnp.float32),
            jax.ShapeDtypeStruct((B, k), jnp.float32),
            jax.ShapeDtypeStruct((B, k, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, k), jnp.bool_),
        )
        kpts, scores, scales, oris, descs, valid = jax.pure_callback(
            host_fn, result_shapes, image
        )
        if "image_size" in data:
            inside = jnp.all(kpts < data["image_size"][:, None, :], axis=-1)
            valid = valid & inside
        return {
            "keypoints": kpts,
            "keypoint_scores": scores,
            "scales": scales,
            "oris": oris,
            "descriptors": descs,
            "keypoint_valid": valid,
        }

    def loss(self, pred, data):
        raise NotImplementedError
