"""GlueStick joint point+line matcher, TPU-native
(reference `gluefactory/models/matchers/gluestick.py:25-787`).

From-scratch JAX implementation of the GlueStick architecture (Pautrat &
Suárez et al., ICCV 2023): keypoint MLP encoder + line endpoint encoder,
L rounds of (self-attention + line message passing + cross-attention) over
the merged junction/keypoint sets, learned-dustbin double softmax for point
assignment, and line assignment from junction score pairs with direction max.

TPU-first choices:
  - line message passing (reference scatter-mean over `lines_junc_idx`,
    `gluestick.py:589-693`) is a masked segment-mean implemented with
    one-hot matmuls (MXU-friendly; L, K are fixed).
  - scan-stacked identical layers; all sets padded + masked.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.assignment import filter_matches, log_double_softmax
from ...ops.attention import masked_attention
from ..base_model import BaseModel
from ..utils.losses import nll_loss
from ..utils.metrics import matcher_metrics
from .lightglue import normalize_keypoints
from .superglue import AttentionalPropagation, KeypointEncoder

__main_class__ = "GlueStick"


class EndPtEncoder(nn.Module):
    """Line-endpoint encoder (reference `gluestick.py:502-521`): MLP over
    (endpoint offset to other endpoint, line score)."""

    dim: int

    @nn.compact
    def __call__(self, lines_norm, line_scores):
        # lines_norm: (B, L, 2, 2) normalized endpoints
        B, L = lines_norm.shape[:2]
        offs = lines_norm[:, :, 1] - lines_norm[:, :, 0]  # (B, L, 2)
        feats0 = jnp.concatenate(
            [lines_norm[:, :, 0], offs, line_scores[..., None]], -1
        )
        feats1 = jnp.concatenate(
            [lines_norm[:, :, 1], -offs, line_scores[..., None]], -1
        )
        x = jnp.stack([feats0, feats1], axis=2).reshape(B, 2 * L, 5)
        for i, ch in enumerate((32, 64, 128, 256)):
            x = nn.Dense(ch, name=f"mlp{i}")(x)
            x = nn.LayerNorm(name=f"norm{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.dim, name="out")(x)  # (B, 2L, D)


def segment_mean_messages(x, lines_junc_idx, line_valid, K):
    """Masked line message passing (reference `LineLayer`, `gluestick.py:589`).

    For each node i: mean over all line-endpoints mapped to i of the feature
    of the *other* endpoint of that line. One-hot matmul formulation keeps
    it on the MXU with fixed shapes.

    x: (B, K, D) node features; lines_junc_idx: (B, L, 2) in [0, K);
    line_valid: (B, L). Returns (B, K, D) messages + (B, K) counts.
    """
    B, L = lines_junc_idx.shape[:2]
    idx_a = lines_junc_idx[:, :, 0]
    idx_b = lines_junc_idx[:, :, 1]
    oh_a = jax.nn.one_hot(idx_a, K, dtype=x.dtype) * line_valid[..., None]
    oh_b = jax.nn.one_hot(idx_b, K, dtype=x.dtype) * line_valid[..., None]
    feat_a = jnp.einsum("blk,bkd->bld", oh_a, x)  # feature at endpoint a
    feat_b = jnp.einsum("blk,bkd->bld", oh_b, x)
    # node a of each line receives the feature of node b, and vice versa
    msg = jnp.einsum("blk,bld->bkd", oh_a, feat_b) + jnp.einsum(
        "blk,bld->bkd", oh_b, feat_a
    )
    count = jnp.sum(oh_a, axis=1) + jnp.sum(oh_b, axis=1)  # (B, K)
    return msg / jnp.maximum(count, 1.0)[..., None], count


class LineMessageLayer(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, lines_junc_idx, line_valid):
        K = x.shape[1]
        msg, count = segment_mean_messages(x, lines_junc_idx, line_valid, K)
        y = jnp.concatenate([x, msg], axis=-1)
        y = nn.Dense(2 * self.dim, name="mlp0")(y)
        y = nn.LayerNorm(name="norm")(y)
        y = nn.relu(y)
        y = nn.Dense(self.dim, name="mlp1")(y)
        # nodes without any line keep their feature unchanged
        return x + jnp.where((count > 0)[..., None], y, 0.0)


class GSLayer(nn.Module):
    """self + line message passing + cross (reference `gluestick.py:694-770`)."""

    dim: int
    num_heads: int
    dtype: str = "float32"
    fused_qkv: bool = False

    @nn.compact
    def __call__(self, carry, _):
        x0, x1, mask0, mask1, lj0, lj1, lv0, lv1 = carry
        self_prop = AttentionalPropagation(
            self.dim, self.num_heads, "layer", self.dtype,
            fused_qkv=self.fused_qkv, same_source=True, name="self")
        line_layer = LineMessageLayer(self.dim, name="line")
        cross_prop = AttentionalPropagation(
            self.dim, self.num_heads, "layer", self.dtype,
            fused_qkv=self.fused_qkv, name="cross")
        x0 = self_prop(x0, x0, mask0)
        x1 = self_prop(x1, x1, mask1)
        x0 = line_layer(x0, lj0, lv0)
        x1 = line_layer(x1, lj1, lv1)
        x0n = cross_prop(x0, x1, mask1)
        x1n = cross_prop(x1, x0, mask0)
        # per-layer features as scan outputs feed intermediate-layer line
        # supervision (reference `gluestick.py:709,272-292`); jit DCEs them
        # when unused (inference / inter_supervision off)
        return (x0n, x1n, mask0, mask1, lj0, lj1, lv0, lv1), (x0n, x1n)


class GlueStick(BaseModel):
    default_conf = {
        "input_dim": 256,
        "descriptor_dim": 256,
        "n_layers": 9,
        "num_heads": 4,
        "filter_threshold": 0.2,
        "line_filter_threshold": 0.2,
        "dtype": "float32",  # "bfloat16": GNN compute on the MXU
        "fused_qkv": False,  # concatenated q/k/v projections (exact)
        # layer indices (into the L scan steps) with extra line supervision
        # (reference `gluestick.py:38,96-107`; None = off)
        "inter_supervision": None,
        "loss": {
            "nll_balancing": 0.5,
            "nll_weight": 1.0,
            "line_weight": 1.0,
            # per-entry weights aligned with `inter_supervision`
            "inter_supervision": (0.3, 0.6),
        },
        "weights": None,
    }
    required_data_keys = (
        "keypoints0",
        "keypoints1",
        "descriptors0",
        "descriptors1",
        "lines0",
        "lines1",
        "lines_junc_idx0",
        "lines_junc_idx1",
    )

    def setup(self):
        c = self.conf
        D = c.descriptor_dim
        self.input_proj = nn.Dense(D, name="input_proj")
        self.kenc = KeypointEncoder(D, name="kenc")
        self.lenc = EndPtEncoder(D, name="lenc")
        self.layers = nn.scan(
            GSLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=c.n_layers,
        )(D, c.num_heads, c.dtype, c.fused_qkv, name="gnn")
        self.final_proj = nn.Dense(D, name="final_proj")
        self.final_line_proj = nn.Dense(D, name="final_line_proj")
        self.bin_score = self.param("bin_score", nn.initializers.constant(1.0), ())
        self.line_bin_score = self.param(
            "line_bin_score", nn.initializers.constant(1.0), ()
        )
        inter = tuple(self.conf.inter_supervision or ())
        self.inter_line_projs = [
            nn.Dense(D, name=f"inter_line_proj{layer}") for layer in inter
        ]

    def _forward(self, data: dict, train: bool = False) -> dict:
        c = self.conf
        kpts0, kpts1 = data["keypoints0"], data["keypoints1"]
        B, N = kpts0.shape[:2]
        M = kpts1.shape[1]
        mask0 = data.get("keypoint_valid0", jnp.ones((B, N), bool))
        mask1 = data.get("keypoint_valid1", jnp.ones((B, M), bool))
        scores0 = data.get("keypoint_scores0", jnp.ones((B, N)))
        scores1 = data.get("keypoint_scores1", jnp.ones((B, M)))
        lines0, lines1 = data["lines0"], data["lines1"]
        lv0 = data.get("line_valid0", jnp.ones(lines0.shape[:2], bool))
        lv1 = data.get("line_valid1", jnp.ones(lines1.shape[:2], bool))
        lj0 = data["lines_junc_idx0"].astype(jnp.int32)
        lj1 = data["lines_junc_idx1"].astype(jnp.int32)
        ls0 = data.get("line_scores0", jnp.ones(lines0.shape[:2]))
        ls1 = data.get("line_scores1", jnp.ones(lines1.shape[:2]))

        size0 = data.get("view0", {}).get("image_size")
        size1 = data.get("view1", {}).get("image_size")
        if size0 is None:
            size0 = jnp.max(kpts0, axis=-2) + 1
        if size1 is None:
            size1 = jnp.max(kpts1, axis=-2) + 1
        p0 = normalize_keypoints(kpts0, size0)
        p1 = normalize_keypoints(kpts1, size1)

        x0 = self.input_proj(data["descriptors0"]) + self.kenc(p0, scores0)
        x1 = self.input_proj(data["descriptors1"]) + self.kenc(p1, scores1)

        # add line-endpoint encodings at junction nodes
        ln0 = normalize_keypoints(lines0.reshape(B, -1, 2), size0).reshape(
            lines0.shape
        )
        ln1 = normalize_keypoints(lines1.reshape(B, -1, 2), size1).reshape(
            lines1.shape
        )
        lemb0 = self.lenc(ln0, ls0)  # (B, 2L, D)
        lemb1 = self.lenc(ln1, ls1)
        oh0 = jax.nn.one_hot(lj0.reshape(B, -1), N, dtype=x0.dtype) * jnp.repeat(
            lv0, 2, axis=-1
        )[..., None]
        oh1 = jax.nn.one_hot(lj1.reshape(B, -1), M, dtype=x1.dtype) * jnp.repeat(
            lv1, 2, axis=-1
        )[..., None]
        x0 = x0 + jnp.einsum("bek,bed->bkd", oh0, lemb0)
        x1 = x1 + jnp.einsum("bek,bed->bkd", oh1, lemb1)

        carry = (x0, x1, mask0, mask1, lj0, lj1, lv0, lv1)
        (x0, x1, *_), inter_feats = self.layers(carry, None)

        d = c.descriptor_dim
        m0 = self.final_proj(x0)
        m1 = self.final_proj(x1)
        sim = jnp.einsum("bnd,bmd->bnm", m0, m1) / d**0.5
        # learned-dustbin double softmax (reference `gluestick.py:248,772`)
        log_plan = log_double_softmax(sim, self.bin_score, mask0, mask1)
        scores = log_plan[:, :-1, :-1]
        matches0, matches1, ms0, ms1 = filter_matches(scores, c.filter_threshold)
        matches0 = jnp.where(mask0, matches0, -1)
        matches1 = jnp.where(mask1, matches1, -1)

        line_out = self._match_lines(
            x0, x1, lj0, lj1, lv0, lv1, self.final_line_proj
        )

        pred = {
            "log_assignment": log_plan,
            "matches0": matches0,
            "matches1": matches1,
            "matching_scores0": jnp.where(mask0, ms0, 0.0),
            "matching_scores1": jnp.where(mask1, ms1, 0.0),
            **line_out,
        }
        # intermediate-layer line supervision heads (reference
        # `gluestick.py:272-292`): match lines from intermediate GNN features
        if train and self.conf.inter_supervision:
            for layer, proj in zip(self.conf.inter_supervision, self.inter_line_projs):
                ix0 = inter_feats[0][layer]
                ix1 = inter_feats[1][layer]
                lout = self._match_lines(ix0, ix1, lj0, lj1, lv0, lv1, proj)
                for k, v in lout.items():
                    pred[f"line_{layer}_{k[len('line_'):]}"] = v
        return pred

    def _match_lines(self, x0, x1, lj0, lj1, lv0, lv1, proj):
        """Line assignment from projected junction descriptors with direction
        max and a learned line dustbin (reference `_get_line_matches`,
        `gluestick.py:336-377`)."""
        B, N = x0.shape[:2]
        M = x1.shape[1]
        L0, L1 = lj0.shape[1], lj1.shape[1]

        def endpoint_desc(x, lj, K):
            # (B, L, 2, D) projected descriptors at the line endpoints
            flat = lj.reshape(B, -1)  # (B, 2L)
            g = jnp.take_along_axis(x, flat[..., None].clip(0, K - 1), axis=1)
            p = proj(g)
            return p.reshape(B, -1, 2, p.shape[-1])

        e0 = endpoint_desc(x0, lj0, N)  # (B, L0, 2, D)
        e1 = endpoint_desc(x1, lj1, M)  # (B, L1, 2, D)
        d = e0.shape[-1]
        sim = jnp.einsum("biad,bjcd->biajc", e0, e1) / d**0.5  # (B,L0,2,L1,2)
        raw = 0.5 * jnp.maximum(
            sim[:, :, 0, :, 0] + sim[:, :, 1, :, 1],
            sim[:, :, 0, :, 1] + sim[:, :, 1, :, 0],
        )  # (B, L0, L1)
        line_la = log_double_softmax(raw, self.line_bin_score, lv0, lv1)
        lm0, lm1, lms0, lms1 = filter_matches(
            line_la[:, :-1, :-1], self.conf.line_filter_threshold
        )
        lm0 = jnp.where(lv0, lm0, -1)
        lm1 = jnp.where(lv1, lm1, -1)
        return {
            "line_log_assignment": line_la,
            "line_matches0": lm0,
            "line_matches1": lm1,
            "line_matching_scores0": jnp.where(lv0, lms0, 0.0),
            "line_matching_scores1": jnp.where(lv1, lms1, 0.0),
        }

    def loss(self, pred: dict, data: dict):
        balancing = float(self.conf.loss["nll_balancing"])
        out = nll_loss(
            pred["log_assignment"],
            data["gt_matches0"],
            data["gt_matches1"],
            nll_balancing=balancing,
        )
        total = self.conf.loss["nll_weight"] * out["assignment_nll"]
        losses = {
            "assignment_nll": out["assignment_nll"],
            "nll_pos": out["nll_pos"],
            "nll_neg": out["nll_neg"],
            "num_matchable": out["num_matchable"],
            "num_unmatchable": out["num_unmatchable"],
        }
        if "gt_line_matches0" in data:
            lout = nll_loss(
                pred["line_log_assignment"],
                data["gt_line_matches0"],
                data["gt_line_matches1"],
                nll_balancing=balancing,
            )
            losses["line_nll"] = lout["assignment_nll"]
            total = total + self.conf.loss["line_weight"] * lout["assignment_nll"]
            # intermediate-layer supervision (reference `gluestick.py:378-440`)
            if self.conf.inter_supervision:
                for layer, w in zip(
                    self.conf.inter_supervision, self.conf.loss["inter_supervision"]
                ):
                    key = f"line_{layer}_log_assignment"
                    if key not in pred:
                        continue
                    iout = nll_loss(
                        pred[key],
                        data["gt_line_matches0"],
                        data["gt_line_matches1"],
                        nll_balancing=balancing,
                    )
                    losses[f"line_{layer}_nll"] = iout["assignment_nll"]
                    total = total + self.conf.loss["line_weight"] * w * iout[
                        "assignment_nll"
                    ]
        losses["total"] = total
        metrics = matcher_metrics(pred, data)
        if "gt_line_matches0" in data:
            metrics.update(matcher_metrics(pred, data, prefix="line_"))
        return losses, metrics
