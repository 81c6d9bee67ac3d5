"""LSD line-segment detector (reference `gluefactory/models/lines/lsd.py:9-88`).

The reference wraps pytlsd (C++); here OpenCV's LSD runs on the host behind
`jax.pure_callback` with fixed-L padded outputs, like the SIFT extractor.
Score = sqrt(length) ranking like the reference's sqrt(len)*NFA ordering.
"""

from __future__ import annotations

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..base_model import BaseModel

__main_class__ = "LSD"


def run_lsd(img_u8: np.ndarray, max_lines: int, min_length: float):
    lsd = cv2.createLineSegmentDetector()
    out = lsd.detect(img_u8)
    segs = out[0]
    nfa = out[3] if len(out) > 3 and out[3] is not None else None
    lines = np.zeros((max_lines, 2, 2), np.float32)
    scores = np.zeros((max_lines,), np.float32)
    valid = np.zeros((max_lines,), bool)
    if segs is not None and len(segs):
        segs = segs.reshape(-1, 2, 2)
        lengths = np.linalg.norm(segs[:, 0] - segs[:, 1], axis=-1)
        keep = lengths >= min_length
        segs, lengths = segs[keep], lengths[keep]
        if nfa is not None:
            nfa = np.asarray(nfa).ravel()[keep]
            score = np.sqrt(lengths) * np.maximum(nfa, 0.0)
        else:
            score = np.sqrt(lengths)
        order = np.argsort(-score)[:max_lines]
        m = len(order)
        lines[:m] = segs[order]
        scores[:m] = score[order]
        valid[:m] = True
    return lines, scores, valid


class LSD(BaseModel):
    default_conf = {
        "max_num_lines": 250,
        "min_length": 15.0,
    }
    required_data_keys = ("image",)

    def setup(self):
        pass

    def _forward(self, data: dict, train: bool = False) -> dict:
        image = data["image"]
        if image.shape[-1] == 3:
            scale = jnp.asarray([0.299, 0.587, 0.114], image.dtype)
            image = jnp.sum(image * scale, axis=-1, keepdims=True)
        B = image.shape[0]
        L = int(self.conf.max_num_lines)
        min_len = float(self.conf.min_length)

        def host_fn(imgs):
            outs = [
                run_lsd((np.asarray(im[..., 0]) * 255).astype(np.uint8), L, min_len)
                for im in imgs
            ]
            return tuple(np.stack([o[i] for o in outs]) for i in range(3))

        shapes = (
            jax.ShapeDtypeStruct((B, L, 2, 2), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.float32),
            jax.ShapeDtypeStruct((B, L), jnp.bool_),
        )
        lines, scores, valid = jax.pure_callback(host_fn, shapes, image)
        return {"lines": lines, "line_scores": scores, "line_valid": valid}

    def loss(self, pred, data):
        raise NotImplementedError
