"""SuperGlue matcher, TPU-native
(reference `gluefactory_nonfree/superglue.py:223-357`).

From-scratch JAX implementation of the SuperGlue architecture (Sarlin et al.,
CVPR 2020): keypoint-MLP positional encoder, L alternating self/cross
attentional GNN layers, Sinkhorn optimal transport with a learned dustbin.
Fixed-shape masked everywhere; layers stacked with nn.scan like LightGlue.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.assignment import filter_matches, log_sinkhorn
from ...ops.attention import masked_attention
from ..base_model import BaseModel
from ..utils.losses import nll_loss
from ..utils.metrics import matcher_metrics
from .lightglue import normalize_keypoints

__main_class__ = "SuperGlue"


class KeypointEncoder(nn.Module):
    """MLP over (x, y, score) -> descriptor-dim embedding
    (reference `superglue.py:74-90`).

    norm="layer" for from-scratch training; "none" for converted official
    checkpoints whose BatchNorm is folded into the Dense layers.
    """

    dim: int
    layers: tuple = (32, 64, 128, 256)
    norm: str = "layer"

    @nn.compact
    def __call__(self, kpts, scores):
        x = jnp.concatenate([kpts, scores[..., None]], axis=-1)
        for i, ch in enumerate(self.layers):
            x = nn.Dense(ch, name=f"mlp{i}")(x)
            if self.norm == "layer":
                x = nn.LayerNorm(name=f"norm{i}")(x)
            x = nn.relu(x)
        return nn.Dense(self.dim, name="out")(x)


class AttentionalPropagation(nn.Module):
    dim: int
    num_heads: int
    norm: str = "layer"
    dtype: str = "float32"
    # One concatenated projection matmul instead of three (exact — the
    # fused kernel is the column-concatenation of q|k|v, see
    # tests/test_gluestick_fused.py). `same_source` marks self-attention
    # (q and k/v share the input, one 3D-wide matmul); cross-attention
    # fuses k|v only. Off by default pending the on-chip A/B
    # (scripts/bench_gluestick_ab.py).
    fused_qkv: bool = False
    same_source: bool = False

    @nn.compact
    def __call__(self, x, source, mask_src):
        B, N, D = x.shape
        H = self.num_heads
        dt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        x = x.astype(dt)
        source = source.astype(dt)
        if self.fused_qkv and self.same_source:
            qkv = nn.Dense(3 * D, dtype=dt, name="qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        elif self.fused_qkv:
            q = nn.Dense(D, dtype=dt, name="q")(x)
            kv = nn.Dense(2 * D, dtype=dt, name="kv")(source)
            k, v = jnp.split(kv, 2, axis=-1)
        else:
            q = nn.Dense(D, dtype=dt, name="q")(x)
            k = nn.Dense(D, dtype=dt, name="k")(source)
            v = nn.Dense(D, dtype=dt, name="v")(source)
        q = q.reshape(B, N, H, D // H).transpose(0, 2, 1, 3)
        k = k.reshape(B, -1, H, D // H).transpose(0, 2, 1, 3)
        v = v.reshape(B, -1, H, D // H).transpose(0, 2, 1, 3)
        msg = masked_attention(q, k, v, mask_src)
        msg = msg.transpose(0, 2, 1, 3).reshape(B, N, D).astype(dt)
        msg = nn.Dense(D, dtype=dt, name="merge")(msg)
        y = jnp.concatenate([x, msg], axis=-1)
        y = nn.Dense(2 * D, dtype=dt, name="mlp0")(y)
        if self.norm == "layer":
            y = nn.LayerNorm(dtype=dt, name="mlp_norm")(y)
        y = nn.relu(y)
        y = nn.Dense(D, dtype=dt, name="mlp1")(y)
        return (x + y).astype(jnp.float32)


class SGLayer(nn.Module):
    """One self + one cross propagation for both sets."""

    dim: int
    num_heads: int
    norm: str = "layer"
    dtype: str = "float32"

    @nn.compact
    def __call__(self, carry, _):
        x0, x1, mask0, mask1 = carry
        self_prop = AttentionalPropagation(self.dim, self.num_heads, self.norm, self.dtype, name="self")
        cross_prop = AttentionalPropagation(self.dim, self.num_heads, self.norm, self.dtype, name="cross")
        x0 = self_prop(x0, x0, mask0)
        x1 = self_prop(x1, x1, mask1)
        x0n = cross_prop(x0, x1, mask1)
        x1n = cross_prop(x1, x0, mask0)
        return (x0n, x1n, mask0, mask1), None


class SuperGlue(BaseModel):
    default_conf = {
        "input_dim": 256,
        "descriptor_dim": 256,
        "n_layers": 9,
        "num_heads": 4,
        "sinkhorn_iterations": 50,
        "filter_threshold": 0.2,
        "norm": "layer",  # "none" for converted BN-folded official weights
        "dtype": "float32",  # "bfloat16": GNN compute on the MXU
        "loss": {"nll_balancing": 0.5},
        "weights": None,
    }
    required_data_keys = ("keypoints0", "keypoints1", "descriptors0", "descriptors1")

    def setup(self):
        c = self.conf
        D = c.descriptor_dim
        self.input_proj = nn.Dense(D, name="input_proj")
        self.kenc = KeypointEncoder(D, norm=c.norm, name="kenc")
        self.layers = nn.scan(
            SGLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=c.n_layers,
        )(D, c.num_heads, c.norm, c.dtype, name="gnn")
        self.final_proj = nn.Dense(D, name="final_proj")
        self.bin_score = self.param(
            "bin_score", nn.initializers.constant(1.0), ()
        )

    def _forward(self, data: dict, train: bool = False) -> dict:
        c = self.conf
        kpts0, kpts1 = data["keypoints0"], data["keypoints1"]
        mask0 = data.get("keypoint_valid0")
        mask1 = data.get("keypoint_valid1")
        if mask0 is None:
            mask0 = jnp.ones(kpts0.shape[:-1], bool)
        if mask1 is None:
            mask1 = jnp.ones(kpts1.shape[:-1], bool)
        scores0 = data.get("keypoint_scores0", jnp.ones(kpts0.shape[:-1]))
        scores1 = data.get("keypoint_scores1", jnp.ones(kpts1.shape[:-1]))

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

        (x0, x1, _, _), _ = self.layers((x0, x1, mask0, mask1), None)

        d = c.descriptor_dim
        m0 = self.final_proj(x0)
        m1 = self.final_proj(x1)
        sim = jnp.einsum("bnd,bmd->bnm", m0, m1) / d**0.5
        log_plan = log_sinkhorn(
            sim, self.bin_score, c.sinkhorn_iterations, mask0, mask1
        )  # (B, N+1, M+1)
        scores = log_plan[:, :-1, :-1]
        matches0, matches1, ms0, ms1 = filter_matches(scores, c.filter_threshold)
        matches0 = jnp.where(mask0, matches0, -1)
        matches1 = jnp.where(mask1, matches1, -1)

        pred = {
            "log_assignment": log_plan,
            "matches0": matches0,
            "matches1": matches1,
            "matching_scores0": jnp.where(mask0, ms0, 0.0),
            "matching_scores1": jnp.where(mask1, ms1, 0.0),
        }
        return pred

    def loss(self, pred: dict, data: dict):
        out = nll_loss(pred["log_assignment"], data["gt_matches0"], data["gt_matches1"])
        losses = {
            "total": out["assignment_nll"],
            "assignment_nll": out["assignment_nll"],
            "nll_pos": out["nll_pos"],
            "nll_neg": out["nll_neg"],
            "num_matchable": out["num_matchable"],
            "num_unmatchable": out["num_unmatchable"],
        }
        metrics = matcher_metrics(pred, data)
        return losses, metrics
