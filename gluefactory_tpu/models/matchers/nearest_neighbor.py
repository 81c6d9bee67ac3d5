"""Nearest-neighbor descriptor matcher
(reference `gluefactory/models/matchers/nearest_neighbor_matcher.py:16-104`).

Cosine-similarity NN with optional ratio test, distance threshold, and mutual
check — all masked matrix ops, one XLA program.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..base_model import BaseModel

__main_class__ = "NearestNeighborMatcher"

INF = 1e9


class NearestNeighborMatcher(BaseModel):
    default_conf = {
        "ratio_thresh": None,
        "distance_thresh": None,
        "mutual_check": True,
    }
    required_data_keys = ("descriptors0", "descriptors1")

    def setup(self):
        pass

    def _forward(self, data: dict, train: bool = False) -> dict:
        d0, d1 = data["descriptors0"], data["descriptors1"]  # (B, N, D), (B, M, D)
        v0 = data.get("keypoint_valid0")
        v1 = data.get("keypoint_valid1")
        if v0 is None:
            v0 = jnp.ones(d0.shape[:-1], bool)
        if v1 is None:
            v1 = jnp.ones(d1.shape[:-1], bool)
        sim = jnp.einsum("bnd,bmd->bnm", d0, d1)  # cosine (descs are L2-normed)
        pair_mask = v0[..., :, None] & v1[..., None, :]
        sim = jnp.where(pair_mask, sim, -INF)

        N, M = sim.shape[-2:]
        m0 = jnp.argmax(sim, axis=-1)  # (B, N)
        s0 = jnp.max(sim, axis=-1)
        m1 = jnp.argmax(sim, axis=-2)  # (B, M)
        s1 = jnp.max(sim, axis=-2)

        ok0 = v0 & (s0 > -INF / 2)
        ok1 = v1 & (s1 > -INF / 2)
        if self.conf.ratio_thresh is not None:
            # second-best similarity for the ratio test (on distances)
            top2 = jnp.sort(sim, axis=-1)[..., -2]
            dist_best = 2.0 - 2.0 * s0
            dist_second = 2.0 - 2.0 * top2
            ok0 = ok0 & (dist_best <= self.conf.ratio_thresh**2 * dist_second)
        if self.conf.distance_thresh is not None:
            ok0 = ok0 & (2.0 - 2.0 * s0 <= self.conf.distance_thresh**2)
        if self.conf.mutual_check:
            idx = jnp.arange(N)[None]
            mutual = idx == jnp.take_along_axis(m1, m0, axis=-1)
            ok0 = ok0 & mutual
            idxm = jnp.arange(M)[None]
            mutual1 = idxm == jnp.take_along_axis(m0, m1, axis=-1)
            ok1 = ok1 & mutual1

        matches0 = jnp.where(ok0, m0, -1).astype(jnp.int32)
        matches1 = jnp.where(ok1, m1, -1).astype(jnp.int32)
        scores0 = jnp.where(ok0, (s0 + 1) / 2, 0.0)
        scores1 = jnp.where(ok1, (s1 + 1) / 2, 0.0)
        return {
            "matches0": matches0,
            "matches1": matches1,
            "matching_scores0": scores0,
            "matching_scores1": scores1,
            "similarity": sim,
        }

    def loss(self, pred, data):
        """Optional descriptor-learning N-pair loss over GT pairs
        (reference `nearest_neighbor_matcher.py:60-104`): InfoNCE on the
        similarity matrix with GT positives, masked for padding/ignore."""
        import jax

        if "gt_matches0" not in data:
            raise NotImplementedError
        sim = pred["similarity"]  # (B, N, M), -INF at invalid pairs
        gt0 = data["gt_matches0"]
        pos = gt0 >= 0
        temperature = self.conf.get("loss_temperature", 0.1)
        logits = sim / temperature
        logp = jax.nn.log_softmax(logits, axis=-1)
        picked = jnp.take_along_axis(
            logp, jnp.maximum(gt0, 0)[..., None], axis=-1
        )[..., 0]
        num_pos = jnp.maximum(jnp.sum(pos, -1), 1)
        nll = -jnp.sum(jnp.where(pos, picked, 0.0), -1) / num_pos
        from ..utils.metrics import matcher_metrics

        return {"total": nll, "npair_nll": nll}, matcher_metrics(pred, data)
