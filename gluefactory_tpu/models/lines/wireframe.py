"""WireframeExtractor: point-extractor + line-extractor fusion
(reference `gluefactory/models/lines/wireframe.py:131-312`).

Line endpoints are clustered into junctions, merged with the keypoint set,
and every line gets `lines_junc_idx` pointers into the merged set — the
input contract of GlueStick.

TPU-first: the reference's DBSCAN (`wireframe.py:55`, sklearn) becomes a
fixed-shape *grid clustering*: endpoints sharing a (nms_radius)-sized cell
merge to the lowest-index representative; junction/keypoint dedup is a
masked distance matrix. Everything jits; no host calls beyond the
extractors' own.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ops.keypoints import sample_descriptors
from .. import get_model
from ..base_model import BaseModel

__main_class__ = "WireframeExtractor"

BIG = 10**9


class WireframeExtractor(BaseModel):
    default_conf = {
        "point_extractor": {
            "name": "superpoint",
            "dense_outputs": True,
        },
        "line_extractor": {"name": "lsd"},
        "nms_radius": 3.0,
        "max_n_junctions": None,  # default: K + 2L slots
    }
    open_conf_keys = ("point_extractor", "line_extractor")
    required_data_keys = ("image",)

    def setup(self):
        pconf = dict(self.conf.point_extractor)
        pconf["dense_outputs"] = True  # junction descriptors need the dense map
        self.point_extractor = get_model(pconf["name"]).from_conf(pconf)
        self.line_extractor = get_model(self.conf.line_extractor["name"]).from_conf(
            self.conf.line_extractor
        )

    def _forward(self, data: dict, train: bool = False) -> dict:
        r = float(self.conf.nms_radius)
        ppred = self.point_extractor(data)
        lpred = self.line_extractor(data)
        kpts = ppred["keypoints"]  # (B, K, 2)
        kscores = ppred["keypoint_scores"]
        kvalid = ppred["keypoint_valid"]
        desc = ppred["descriptors"]
        dense = ppred["dense_descriptors"]  # (B, Hc, Wc, C)
        lines = lpred["lines"]  # (B, L, 2, 2)
        lvalid = lpred["line_valid"]
        lscores = lpred["line_scores"]

        B, K = kpts.shape[:2]
        L = lines.shape[1]
        E = 2 * L
        eps = lines.reshape(B, E, 2)
        ep_valid = jnp.repeat(lvalid, 2, axis=-1)  # (B, E)

        # --- grid clustering of endpoints -> junction representatives -------
        W_cells = 1 << 14
        cell = (
            jnp.floor(eps[..., 1] / r).astype(jnp.int32) * W_cells
            + jnp.floor(eps[..., 0] / r).astype(jnp.int32)
        )
        # invalid endpoints get unique negative cells (never merge)
        cell = jnp.where(ep_valid, cell, -1 - jnp.arange(E)[None])
        same = cell[:, :, None] == cell[:, None, :]  # (B, E, E)
        idx_e = jnp.arange(E)
        rep = jnp.min(jnp.where(same, idx_e[None, None, :], BIG), axis=-1)  # (B, E)
        count = jnp.sum(same, axis=-1)  # (B, E)
        junc_pos = jnp.einsum("bij,bjc->bic", same.astype(eps.dtype), eps) / jnp.maximum(
            count, 1
        )[..., None]
        is_rep = (rep == idx_e[None]) & ep_valid

        # --- dedup junctions against keypoints ------------------------------
        d2 = jnp.sum(
            (junc_pos[:, :, None, :] - kpts[:, None, :, :]) ** 2, axis=-1
        )  # (B, E, K)
        d2 = jnp.where(kvalid[:, None, :], d2, BIG)
        nearest_kp = jnp.argmin(d2, axis=-1)  # (B, E)
        near = jnp.min(d2, axis=-1) < r * r

        # merged index of each endpoint-representative
        junc_idx = jnp.where(near, nearest_kp, K + idx_e[None])  # (B, E)
        # endpoints inherit their representative's merged index
        ep_merged = jnp.take_along_axis(junc_idx, rep.clip(0, E - 1), axis=-1)
        lines_junc_idx = ep_merged.reshape(B, L, 2)

        # --- merged keypoint set -------------------------------------------
        new_slot = is_rep & ~near  # junction gets its own slot at K+e
        all_pos = jnp.concatenate([kpts, junc_pos], axis=1)  # (B, K+E, 2)
        junc_score = jnp.repeat(lscores, 2, axis=-1)
        junc_score = junc_score / jnp.maximum(jnp.max(junc_score, -1, keepdims=True), 1e-6)
        all_scores = jnp.concatenate([kscores, junc_score], axis=1)
        all_valid = jnp.concatenate([kvalid, new_slot], axis=1)
        all_pos = jnp.where(all_valid[..., None], all_pos, 0.0)
        all_scores = jnp.where(all_valid, all_scores, 0.0)

        dense_cf = jnp.moveaxis(dense, -1, 1)
        junc_desc = sample_descriptors(junc_pos, dense_cf, 8)
        all_desc = jnp.concatenate([desc, junc_desc], axis=1)
        all_desc = jnp.where(all_valid[..., None], all_desc, 0.0)

        return {
            "keypoints": all_pos,
            "keypoint_scores": all_scores,
            "descriptors": all_desc,
            "keypoint_valid": all_valid,
            "lines": lines,
            "line_scores": lscores,
            "line_valid": lvalid,
            "lines_junc_idx": lines_junc_idx,
        }

    def loss(self, pred, data):
        raise NotImplementedError
