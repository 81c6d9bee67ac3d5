"""LightGlue matcher, TPU-native
(reference `gluefactory/models/matchers/lightglue.py:322-640`).

A from-scratch JAX implementation of the LightGlue architecture (Lindenberger
et al., ICCV 2023): rotary-encoded transformer over two keypoint sets with
per-layer self + bidirectional-cross attention, double-softmax + matchability
assignment, deep supervision.

TPU-first choices:
  - The L identical layers are stacked with `nn.scan` -> one compiled layer
    body, params of shape (L, ...): small compile time, and the natural
    substrate for masked adaptive depth (`lax.while_loop` over the scan axis).
  - All attention is masked fixed-shape; the reference's data-dependent
    width pruning (`lightglue.py:506-521`) becomes confidence-based *masking*
    (`prune_mask`), keeping shapes static under jit.
  - Per-layer assignments for the training loss are collected as scan outputs
    instead of re-running heads in `loss` (same math as the reference's
    deep supervision, `lightglue.py:588-637`).
"""

from __future__ import annotations

import math
import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.assignment import filter_matches, sigmoid_log_double_softmax, with_dustbins
from ...ops.attention import (
    apply_cached_rotary_emb,
    bidirectional_cross_attention,
    masked_attention,
    rotary_emb_2d,
)
from ..base_model import BaseModel
from ..utils.losses import nll_loss
from ..utils.metrics import matcher_metrics

__main_class__ = "LightGlue"


def normalize_keypoints(kpts: jnp.ndarray, size: jnp.ndarray) -> jnp.ndarray:
    """Center + scale keypoints by image size (reference `lightglue.py:29-41`).

    kpts: (B, N, 2); size: (B, 2) as (w, h).
    """
    size = size.astype(kpts.dtype)
    shift = size / 2
    scale = jnp.max(size, axis=-1, keepdims=True) / 2
    return (kpts - shift[:, None, :]) / scale[:, None, :]


class _DenseParams(nn.Module):
    """Bare Dense parameters with nn.Dense's naming/shapes/init, so blocks
    that rewrite the Dense algebra (the out_proj fold) stay checkpoint- and
    conversion-compatible with the plain path."""

    din: int
    dout: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.din, self.dout)
        )
        b = self.param("bias", nn.initializers.zeros, (self.dout,))
        return k, b


class _LNParams(nn.Module):
    """Bare LayerNorm parameters with nn.LayerNorm's naming/shapes/init, for
    paths that consume the raw scale/bias (the fused layer kernel)."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return s, b


def _fused_layer_ok(n: int, m: int, head_dim: int) -> bool:
    from ...ops.attention import _use_pallas
    from ...ops.pallas_lg_layer import fits_fused_layer

    return _use_pallas() and fits_fused_layer(n, m, head_dim)


def _merged_message_ffn0(x, msg, op, f0, dt):
    """Inference-only algebraic fold of out_proj into ffn0's message half:

        ffn0([x, out_proj(msg)]) = x @ W0x + msg @ (Wo W0m) + (bo W0m + b0)

    Exact in f32 (tested); removes the (N, D)x(D, D) out_proj matmul and the
    HBM materialization of the concat per block. The tiny (D, D)x(D, 2D)
    weight compose runs per scan step in f32 (~1% of the savings)."""
    D = x.shape[-1]
    op_k, op_b = op
    f0_k, f0_b = f0
    w0x, w0m = f0_k[:D], f0_k[D:]
    wf = (op_k.astype(jnp.float32) @ w0m.astype(jnp.float32)).astype(dt)
    bf = (
        op_b.astype(jnp.float32) @ w0m.astype(jnp.float32)
        + f0_b.astype(jnp.float32)
    ).astype(dt)
    return x @ w0x.astype(dt) + msg @ wf + bf


class SelfBlock(nn.Module):
    """Self-attention with rotary positions (reference `lightglue.py:132-166`).

    Operates on BOTH views stacked along the batch axis (2B, N, D): attention
    is per-batch-element, so view stacking is exact and runs every Dense/
    attention op once at double width — fewer dispatches, fuller MXU tiles.
    """

    dim: int
    num_heads: int
    dtype: str = "float32"
    # qkv projection output column order:
    #   "dh3": official-checkpoint innermost (Dh, 3) — q/k/v extraction is a
    #          stride-3 LANE gather per layer (layout-hostile on the (8, 128)
    #          tiling, like the interleaved rotary was);
    #   "3hd": outermost (3, H, Dh) — q/k/v are contiguous slices. Same math:
    #          the conversion map permutes the SAME columns of the weight
    #          (`torch_weights._qkv_columns_3hd`), checkpoints interchange.
    qkv_layout: str = "dh3"

    @nn.compact
    def __call__(self, x, encoding, mask, fold: bool = False,
                 fused: bool = False):
        B, N, D = x.shape
        H = self.num_heads
        dt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        x = x.astype(dt)
        if fused and _fused_layer_ok(N, N, D // H):
            # whole block in one Pallas/VMEM pass (inference only): QKV,
            # rotary, attention, folded out_proj+ffn0, LN, GELU, ffn1, +x
            from ...ops.pallas_lg_layer import fused_self_block

            qkv_p = _DenseParams(D, 3 * D, name="Wqkv")()
            op = _DenseParams(D, D, name="out_proj")()
            f0 = _DenseParams(2 * D, 2 * D, name="ffn0")()
            ln = _LNParams(2 * D, name="ffn_norm")()
            f1 = _DenseParams(2 * D, D, name="ffn1")()
            params = {
                "Wqkv": {"kernel": qkv_p[0], "bias": qkv_p[1]},
                "out_proj": {"kernel": op[0], "bias": op[1]},
                "ffn0": {"kernel": f0[0], "bias": f0[1]},
                "ffn_norm": {"scale": ln[0], "bias": ln[1]},
                "ffn1": {"kernel": f1[0], "bias": f1[1]},
            }
            return fused_self_block(
                x, encoding.astype(dt), mask, params,
                num_heads=H, qkv_layout=self.qkv_layout,
            )
        qkv = nn.Dense(3 * D, dtype=dt, name="Wqkv")(x)
        if self.qkv_layout == "3hd":
            qkv = qkv.reshape(B, N, 3, H, D // H)
            q, k, v = (
                qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)
            )  # (B, H, N, Dh)
        else:
            qkv = qkv.reshape(B, N, H, D // H, 3)
            q, k, v = (
                jnp.moveaxis(qkv[..., i], 2, 1) for i in range(3)
            )  # (B, H, N, Dh)
        # rotary in the compute dtype (the reference's autocast applies it in
        # fp16 too, `lightglue.py:43-47`); f32 when the model runs f32
        enc = encoding.astype(dt)
        q = apply_cached_rotary_emb(enc, q)
        k = apply_cached_rotary_emb(enc, k)
        msg = masked_attention(q, k, v, mask)  # (B, H, N, Dh)
        msg = jnp.moveaxis(msg, 1, 2).reshape(B, N, D).astype(dt)
        op = _DenseParams(D, D, name="out_proj")()
        f0 = _DenseParams(2 * D, 2 * D, name="ffn0")()
        if fold:
            y = _merged_message_ffn0(x, msg, op, f0, dt)
        else:
            msg = msg @ op[0].astype(dt) + op[1].astype(dt)
            y = jnp.concatenate([x, msg], axis=-1)
            y = y @ f0[0].astype(dt) + f0[1].astype(dt)
        # torch parity: LayerNorm eps=1e-5, exact-erf GELU
        y = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="ffn_norm")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(D, dtype=dt, name="ffn1")(y)
        return x + y


class CrossBlock(nn.Module):
    """Bidirectional cross-attention with shared QK
    (reference `lightglue.py:167-215`).

    Takes the stacked (2B, N, D) view tensor; only the attention itself
    splits into the two views — projections and FFN run stacked.
    """

    dim: int
    num_heads: int
    dtype: str = "float32"
    # run to_qk and to_v as ONE (D, 2D) matmul (kernels concatenated at
    # trace time — param names/checkpoints unchanged): one MXU dispatch
    # instead of two half-width ones.
    merge_proj: bool = False

    @nn.compact
    def __call__(self, x, mask0, mask1, fold: bool = False,
                 fused: bool = False):
        B2, N, D = x.shape
        B = B2 // 2
        H = self.num_heads
        dt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        x = x.astype(dt)
        if fused and _fused_layer_ok(N, N, D // H):
            # whole block in one Pallas/VMEM pass (inference only): shared
            # similarity, both softmax directions, folded FFN tails
            from ...ops.pallas_lg_layer import fused_cross_block

            qk_p = _DenseParams(D, D, name="to_qk")()
            v_p = _DenseParams(D, D, name="to_v")()
            op = _DenseParams(D, D, name="out_proj")()
            f0 = _DenseParams(2 * D, 2 * D, name="ffn0")()
            ln = _LNParams(2 * D, name="ffn_norm")()
            f1 = _DenseParams(2 * D, D, name="ffn1")()
            params = {
                "to_qk": {"kernel": qk_p[0], "bias": qk_p[1]},
                "to_v": {"kernel": v_p[0], "bias": v_p[1]},
                "out_proj": {"kernel": op[0], "bias": op[1]},
                "ffn0": {"kernel": f0[0], "bias": f0[1]},
                "ffn_norm": {"scale": ln[0], "bias": ln[1]},
                "ffn1": {"kernel": f1[0], "bias": f1[1]},
            }
            y0, y1 = fused_cross_block(
                x[:B], x[B:], mask0, mask1, params, num_heads=H
            )
            return jnp.concatenate([y0, y1], axis=0)
        if self.merge_proj:
            qk_p = _DenseParams(D, D, name="to_qk")()
            v_p = _DenseParams(D, D, name="to_v")()
            w = jnp.concatenate([qk_p[0], v_p[0]], axis=1).astype(dt)
            b = jnp.concatenate([qk_p[1], v_p[1]]).astype(dt)
            qkv_ = x @ w + b
            qk, v = qkv_[..., :D], qkv_[..., D:]
        else:
            qk = nn.Dense(D, dtype=dt, name="to_qk")(x)
            v = nn.Dense(D, dtype=dt, name="to_v")(x)
        qk = qk.reshape(B2, N, H, D // H).transpose(0, 2, 1, 3)
        v = v.reshape(B2, N, H, D // H).transpose(0, 2, 1, 3)
        m0, m1 = bidirectional_cross_attention(
            qk[:B], qk[B:], v[:B], v[B:], mask0, mask1
        )
        msg = jnp.concatenate([m0, m1], axis=0)  # (2B, H, N, Dh)
        msg = msg.transpose(0, 2, 1, 3).reshape(B2, N, D).astype(dt)
        op = _DenseParams(D, D, name="out_proj")()
        f0 = _DenseParams(2 * D, 2 * D, name="ffn0")()
        if fold:
            y = _merged_message_ffn0(x, msg, op, f0, dt)
        else:
            msg = msg @ op[0].astype(dt) + op[1].astype(dt)
            y = jnp.concatenate([x, msg], axis=-1)
            y = y @ f0[0].astype(dt) + f0[1].astype(dt)
        y = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="ffn_norm")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(D, dtype=dt, name="ffn1")(y)
        return x + y


class MatchAssignment(nn.Module):
    """Similarity + matchability head (reference `lightglue.py:272-293`).

    `compute_scores` (traced bool) gates the HBM-heavy (B, N, M) similarity +
    double-softmax under `lax.cond`: during inference only the last layer
    needs it (deep supervision needs all layers in training).
    """

    dim: int
    dtype: str = "float32"
    # inference-only fused Pallas path (ops/pallas_assignment.py): one VMEM
    # pass instead of several HBM-sized softmax intermediates. Not used in
    # the training scan (the deep-supervision path needs gradients).
    use_kernel: bool = False

    @nn.compact
    def __call__(self, x0, x1, mask0, mask1, compute_scores=None):
        d = self.dim
        dt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        proj = nn.Dense(d, dtype=dt, name="final_proj")
        mdesc0 = proj(x0.astype(dt)) / d**0.25
        mdesc1 = proj(x1.astype(dt)) / d**0.25
        matchability = nn.Dense(1, name="matchability")
        z0 = matchability(x0.astype(jnp.float32))[..., 0]
        z1 = matchability(x1.astype(jnp.float32))[..., 0]

        def heavy(_):
            from ...ops.attention import _use_pallas

            if self.use_kernel and _use_pallas():
                from ...ops.pallas_assignment import (
                    fits_fused_assignment,
                    fused_assignment,
                )

                if fits_fused_assignment(x0.shape[1], x1.shape[1]):
                    m0 = (
                        mask0
                        if mask0 is not None
                        else jnp.ones(x0.shape[:2], bool)
                    )
                    m1 = (
                        mask1
                        if mask1 is not None
                        else jnp.ones(x1.shape[:2], bool)
                    )
                    return fused_assignment(mdesc0, mdesc1, z0, z1, m0, m1)
            # bf16 operands, f32 MXU accumulation; softmax math stays f32
            sim = jnp.einsum(
                "bnd,bmd->bnm",
                mdesc0,
                mdesc1,
                preferred_element_type=jnp.float32,
            )
            return sigmoid_log_double_softmax(sim, z0, z1, mask0, mask1)

        B, N = x0.shape[:2]
        M = x1.shape[1]
        if compute_scores is None or compute_scores is True:
            scores = heavy(None)
        elif compute_scores is False:  # static skip (adaptive-depth body)
            scores = jnp.full((B, N, M), -1e9, jnp.float32)
        else:
            scores = jax.lax.cond(
                compute_scores,
                heavy,
                lambda _: jnp.full((B, N, M), -1e9, jnp.float32),
                None,
            )
        return scores, z0, z1


class LGLayer(nn.Module):
    """One LightGlue layer: self + cross + (train) assignment head."""

    dim: int
    num_heads: int
    width_confidence: float = -1.0
    dtype: str = "float32"
    nll_balancing: float = 0.5
    fold_out_proj: bool = False
    qkv_layout: str = "dh3"
    merge_cross_proj: bool = False
    fused_layer: bool = False

    @nn.compact
    def __call__(
        self, carry, xs, collect_scores: bool = True, gt=None,
        need_conf: bool = True,
    ):
        is_last, conf_th = xs
        # x stacks both views along the batch axis: (2B, N, D)
        x, enc, mask0, mask1, train_flag = carry
        B = x.shape[0] // 2
        mask = jnp.concatenate([mask0, mask1], axis=0)
        self_block = SelfBlock(
            self.dim, self.num_heads, self.dtype,
            qkv_layout=self.qkv_layout, name="self_attn",
        )
        cross_block = CrossBlock(
            self.dim, self.num_heads, self.dtype,
            merge_proj=self.merge_cross_proj, name="cross_attn",
        )
        # the out_proj fold is an inference-only reparametrization: training
        # must keep the unfused params as the gradient variables
        inference = (
            not collect_scores and gt is None and not self.is_initializing()
        )
        fold = self.fold_out_proj and inference
        # the fused layer kernel bakes the fold algebra in regardless of the
        # fold flag (both are exact inference-time reparametrizations)
        fused = self.fused_layer and inference
        x = self_block(x, enc, mask, fold, fused)
        x = cross_block(x, mask0, mask1, fold, fused)
        x0, x1 = x[:B], x[B:]
        # per-layer heads; the heavy assignment only for training (deep
        # supervision) or the last layer (inference). When neither the
        # per-layer scores nor the matchability logits can be consumed
        # (inference with width pruning off), the whole head is STATICALLY
        # skipped: its mdesc projections feed the lax.cond and would
        # otherwise run every layer (flax params still exist; unused at
        # apply). The exit layer's assignment runs post-scan from sliced
        # params (`_forward`).
        need_assignment = (
            collect_scores or self.width_confidence > 0 or gt is not None
        )
        need_conf = need_conf or self.width_confidence > 0
        if self.is_initializing():
            need_assignment = need_conf = True
        if need_assignment:
            compute = (
                is_last
                if isinstance(is_last, bool)
                else (train_flag | is_last)
            )
            scores, z0, z1 = MatchAssignment(
                self.dim, self.dtype, name="log_assignment"
            )(x0, x1, mask0, mask1, compute_scores=compute)
        # one confidence head shared by both sets (reference `lightglue.py:69`);
        # descriptors are detached so the BCE never trains the transformer
        # (reference TokenConfidence detaches, `lightglue.py:76-83`).
        # Skipped statically when nothing consumes it (inference with
        # adaptive depth and width both off): scan outputs are materialized
        # even when unused downstream.
        if need_conf:
            conf_head = nn.Dense(1, name="token_confidence")
            conf = jax.nn.sigmoid(conf_head(jax.lax.stop_gradient(x)))[..., 0]
            conf0, conf1 = conf[:B], conf[B:]
        if self.width_confidence > 0:
            # masked width pruning (reference `get_pruning_mask`,
            # `lightglue.py:560-566`): keep tokens that look matchable
            # (matchability > 1 - width_confidence) or are still undecided
            # (confidence below this layer's threshold). Static shapes:
            # pruning = masking, not index_select. Branchless on the (traced)
            # train flag: no pruning during training.
            def prune(conf, z, mask):
                matchable = jax.nn.sigmoid(z) > (1.0 - self.width_confidence)
                undecided = conf <= conf_th
                return mask & (matchable | undecided | train_flag)

            mask0 = prune(conf0, z0, mask0)
            mask1 = prune(conf1, z1, mask1)
        if collect_scores and gt is not None:
            # in-scan deep supervision (`loss.in_scan`): reduce this layer's
            # (B, N, M) assignment to its scalar loss terms inside the scan,
            # so training never stacks L x (B, N, M) activations — with
            # `remat` this makes training memory O(1) in depth (the enabler
            # for reference-scale batch-128 on a single 16 GB chip).
            gt0, gt1 = gt
            la = with_dustbins(scores, z0, z1, mask0, mask1)
            terms = nll_loss(la, gt0, gt1, nll_balancing=self.nll_balancing)
            lad = jax.lax.stop_gradient(la)
            out = {
                **terms,
                # per-layer matches incl. dustbin option, for the detached
                # confidence BCE targets (reference `lightglue.py:620-633`)
                "argmax0": jnp.argmax(lad[:, :-1, :], -1),
                "argmax1": jnp.argmax(lad[:, :, :-1], -2),
                "conf0": conf0,
                "conf1": conf1,
            }
        elif collect_scores:
            out = {"scores": scores, "z0": z0, "z1": z1, "conf0": conf0, "conf1": conf1}
        elif need_conf:
            # inference: the stacked (L, B, N, M) score tensor (and the per-
            # layer similarity einsum feeding it) would be dead weight — omit
            # it from the scan outputs so XLA dead-code-eliminates the heavy
            # head; the exit layer's assignment is applied post-scan.
            out = {"conf0": conf0, "conf1": conf1}
        else:
            out = {}
        return (x, enc, mask0, mask1, train_flag), out


class LightGlue(BaseModel):
    default_conf = {
        "input_dim": 256,
        "descriptor_dim": 256,
        "n_layers": 9,
        "num_heads": 4,
        # append detection scale + orientation to the positional encoding
        # input (SIFT-style features; reference `lightglue.py:350,441-447`)
        "add_scale_ori": False,
        "filter_threshold": 0.1,
        "depth_confidence": -1,  # adaptive depth (masked; -1 = off)
        "width_confidence": -1,  # adaptive width via masking (-1 = off)
        "dtype": "float32",  # "bfloat16": transformer compute on the MXU
        # inference-only fold of each block's out_proj into ffn0's message
        # half (exact algebra, `_merged_message_ffn0`): one fewer (N, D)x
        # (D, D) matmul + concat materialization per block
        "fold_out_proj": False,
        # qkv projection column order: "dh3" (official innermost (Dh, 3)) or
        # "3hd" (contiguous q/k/v slices, layout-friendly on TPU lanes);
        # conversion permutes checkpoint columns to match (SelfBlock doc)
        "qkv_layout": "dh3",
        # one merged (D, 2D) cross to_qk/to_v matmul (CrossBlock doc)
        "merge_cross_proj": False,
        # evaluate each self/cross block as ONE Pallas kernel (inference on
        # TPU): QKV+rotary+attention+folded FFN+LN+GELU in a single VMEM
        # pass (ops/pallas_lg_layer.py) — removes the per-layer HBM round
        # trips behind the ~32% MXU utilization
        "fused_layer": False,
        # lax.scan unroll factor for the layer stack: >1 lets XLA fuse
        # across layer boundaries at the cost of compile time
        "scan_unroll": 1,
        # fused Pallas exit head (ops/pallas_assignment.py); off until
        # validated on the real chip (see docs/kernels.md)
        "kernel_exit_head": False,
        # rematerialize layer activations in the backward pass (the TPU
        # analog of the reference's per-layer gradient checkpointing,
        # `lightglue.py:484-492`): big-batch training trades ~30% step time
        # for O(1)-in-depth activation memory.
        "remat": False,
        # Tensor parallelism over the keypoint (token) axis (SURVEY.md §5.7):
        # set to a mesh axis name (e.g. "model") and call the model under
        # `jax.sharding.set_mesh(mesh)` — GSPMD sharding constraints anchor
        # the token axis to that mesh axis and XLA inserts the all-gathers
        # (K/V) and psums (column softmax) over ICI. `dp_axis` is the batch
        # axis. None = single-chip / pure-DP (no constraints emitted).
        "tp_axis": None,
        "dp_axis": "data",
        "loss": {
            "gamma": 1.0,
            "nll_balancing": 0.5,
            "confidence_weight": 1.0,
            # compute each layer's deep-supervision NLL inside the scan
            # instead of stacking L x (B, N, M) assignments: with `remat`,
            # training activation memory becomes O(1) in depth. Same math
            # (tested); requires GT labels available in-forward
            # (`two_view_pipeline.run_gt_in_forward`).
            "in_scan": False,
        },
        "weights": None,
    }
    required_data_keys = ("keypoints0", "keypoints1", "descriptors0", "descriptors1")

    def setup(self):
        c = self.conf
        D = c.descriptor_dim
        self.input_proj = nn.Dense(D, name="input_proj")
        head_dim = D // c.num_heads
        self.posenc_freqs = self.param(
            "posenc_freqs",
            nn.initializers.normal(stddev=1.0),
            (2 + 2 * int(bool(c.add_scale_ori)), head_dim // 2),
        )
        layer_cls = (
            nn.remat(LGLayer, static_argnums=(3, 5)) if c.get("remat") else LGLayer
        )
        self.layers = nn.scan(
            layer_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=c.n_layers,
            # xs scanned; collect_scores/need_conf (static) + gt broadcast
            in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast),
            unroll=int(c.get("scan_unroll", 1)),
        )(
            D,
            c.num_heads,
            float(c.width_confidence),
            c.dtype,
            float(c.loss["nll_balancing"]),
            bool(c.get("fold_out_proj", False)),
            str(c.get("qkv_layout", "dh3")),
            bool(c.get("merge_cross_proj", False)),
            bool(c.get("fused_layer", False)),
            name="layers",
        )

    def _forward(self, data: dict, train: bool = False) -> dict:
        c = self.conf
        kpts0, kpts1 = data["keypoints0"], data["keypoints1"]
        d0, d1 = data["descriptors0"], data["descriptors1"]
        mask0 = data.get("keypoint_valid0")
        mask1 = data.get("keypoint_valid1")
        if mask0 is None:
            mask0 = jnp.ones(kpts0.shape[:-1], bool)
        if mask1 is None:
            mask1 = jnp.ones(kpts1.shape[:-1], bool)

        size0 = data.get("view0", {}).get("image_size")
        size1 = data.get("view1", {}).get("image_size")
        if size0 is None:
            size0 = jnp.max(kpts0, axis=-2) + 1
        if size1 is None:
            size1 = jnp.max(kpts1, axis=-2) + 1
        p0 = normalize_keypoints(kpts0, size0)
        p1 = normalize_keypoints(kpts1, size1)

        x0 = self.input_proj(d0)
        x1 = self.input_proj(d1)
        if c.add_scale_ori:
            # append raw detection scale + orientation channels to the
            # positional-encoding input (reference `lightglue.py:441-447`)
            p0 = jnp.concatenate(
                [p0, data["scales0"][..., None], data["oris0"][..., None]], -1
            )
            p1 = jnp.concatenate(
                [p1, data["scales1"][..., None], data["oris1"][..., None]], -1
            )
        enc0 = rotary_emb_2d(p0, self.posenc_freqs)
        enc1 = rotary_emb_2d(p1, self.posenc_freqs)

        # the layer stack processes both views stacked along the batch axis
        # (exact: attention/norms are per batch element) — pad the token axis
        # to a common length first when the two sets differ.
        B, N = x0.shape[:2]
        M = x1.shape[1]
        K = max(N, M)
        if N != M:

            def pad_tokens(a, n):
                width = [(0, 0)] * a.ndim
                width[1] = (0, K - n)
                return jnp.pad(a, width)

            x0p, x1p = pad_tokens(x0, N), pad_tokens(x1, M)
            enc0p, enc1p = pad_tokens(enc0, N), pad_tokens(enc1, M)
            mask0p, mask1p = pad_tokens(mask0, N), pad_tokens(mask1, M)
        else:
            x0p, x1p, enc0p, enc1p, mask0p, mask1p = (
                x0, x1, enc0, enc1, mask0, mask1,
            )

        if c.tp_axis:
            # anchor the token axis to the TP mesh axis; the constraint on the
            # scan carry keeps every layer's activations token-sharded, and
            # XLA emits the K/V all-gathers + assignment-softmax collectives.
            x0p, x1p, enc0p, enc1p, mask0p, mask1p = self._tp_shard(
                x0p, x1p, enc0p, enc1p, mask0p, mask1p
            )

        dt = jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32
        x = jnp.concatenate([x0p, x1p], axis=0).astype(dt)  # (2B, K, D)
        enc = jnp.concatenate([enc0p, enc1p], axis=0)

        L = c.n_layers
        # per-layer confidence thresholds (reference `confidence_threshold`,
        # `lightglue.py:556-558`)
        conf_ths = jnp.asarray(
            [min(0.8 + 0.1 * math.exp(-4.0 * i / L), 1.0) for i in range(L)],
            jnp.float32,
        )

        if not train and c.depth_confidence > 0 and not self.is_initializing():
            # (during init fall through to the scan path: the adaptive body
            # slices `self.layers.variables`, which do not exist yet)
            return self._forward_adaptive_depth(
                x, enc, mask0p, mask1p, (N, M), conf_ths
            )

        is_last = jnp.arange(L) == (L - 1)
        carry = (x, enc, mask0p, mask1p, jnp.asarray(train))
        # training (deep supervision) stacks per-layer scores — or, with
        # loss.in_scan, reduces each layer to its scalar loss terms inside
        # the scan; at inference the stacked (L, B, N, M) tensor is omitted
        # (dead-code-eliminated) and the exit head runs once post-scan.
        collect = train or self.is_initializing()
        in_scan_loss = (
            train
            and bool(c.loss.get("in_scan", False))
            and "gt_matches0" in data
        )
        gt = None
        if in_scan_loss:
            gt0 = data["gt_matches0"].astype(jnp.int32)
            gt1 = data["gt_matches1"].astype(jnp.int32)
            if N != M:  # padded tokens carry the IGNORE label
                gt0 = jnp.pad(gt0, ((0, 0), (0, K - N)), constant_values=-2)
                gt1 = jnp.pad(gt1, ((0, 0), (0, K - M)), constant_values=-2)
            gt = (gt0, gt1)
        # the confidence head is only consumed by training BCE targets or the
        # adaptive width/depth paths; statically skip it otherwise
        need_conf = collect or float(c.width_confidence) > 0
        carry, per_layer = self.layers(
            carry, (is_last, conf_ths), collect, gt, need_conf
        )
        x0, x1 = carry[0][:B, :N], carry[0][B:, :M]
        mask0_f, mask1_f = carry[2][:, :N], carry[3][:, :M]  # after pruning

        if collect and not in_scan_loss:
            # final-layer assignment comes from the scanned per-layer heads
            scores = per_layer["scores"][-1][:, :N, :M]
        else:
            lparams = self.layers.variables["params"]
            head = MatchAssignment(
                c.descriptor_dim,
                c.dtype,
                # fused Pallas head: on-chip validated exact (match
                # agreement 1.0, score delta 0.0 vs XLA at B=8/1024 kpts,
                # scripts/validate_exit_head.py) but perf-neutral there
                # (252.9 vs 253.5 pairs/s) — the post-scan restructure
                # already removed the HBM-bound machinery. Off by default;
                # available for larger tiles via kernel_exit_head.
                use_kernel=bool(c.get("kernel_exit_head", False))
                and not in_scan_loss,
                parent=None,
            )
            p_head = jax.tree_util.tree_map(
                lambda a: a[-1], lparams["log_assignment"]
            )
            if in_scan_loss:
                # gradients flow through the in-scan losses; the final
                # assignment here is for matches/metrics only
                x0h, x1h = jax.lax.stop_gradient((x0, x1))
            else:
                x0h, x1h = x0, x1
            scores, _, _ = head.apply(
                {"params": p_head}, x0h, x1h, mask0_f, mask1_f, compute_scores=True
            )
        if c.tp_axis and self._tp_active():
            # rows of the (B, N, M) assignment ride the token sharding
            scores = jax.lax.with_sharding_constraint(
                scores, jax.sharding.PartitionSpec(c.dp_axis, c.tp_axis, None)
            )
        m0, m1, ms0, ms1 = filter_matches(scores, c.filter_threshold)
        m0 = jnp.where(mask0, m0, -1)
        m1 = jnp.where(mask1, m1, -1)

        pred = {
            "log_assignment": scores,
            "matches0": m0,
            "matches1": m1,
            "matching_scores0": jnp.where(mask0, ms0, 0.0),
            "matching_scores1": jnp.where(mask1, ms1, 0.0),
        }
        if train and in_scan_loss:
            for k in (
                "assignment_nll",
                "nll_pos",
                "nll_neg",
                "num_matchable",
                "num_unmatchable",
            ):
                pred[f"all_{k}"] = per_layer[k]  # (L, B)
            pred["all_argmax0"] = per_layer["argmax0"][:, :, :N]
            pred["all_argmax1"] = per_layer["argmax1"][:, :, :M]
            pred["all_conf0"] = per_layer["conf0"][:, :, :N]
            pred["all_conf1"] = per_layer["conf1"][:, :, :M]
            pred["keypoint_valid0"] = mask0
            pred["keypoint_valid1"] = mask1
        elif train:
            pred["all_log_assignment"] = per_layer["scores"][:, :, :N, :M]
            pred["all_conf0"] = per_layer["conf0"][:, :, :N]
            pred["all_conf1"] = per_layer["conf1"][:, :, :M]
            pred["all_z0"] = per_layer["z0"][:, :, :N]  # matchability logits
            pred["all_z1"] = per_layer["z1"][:, :, :M]
            pred["keypoint_valid0"] = mask0
            pred["keypoint_valid1"] = mask1
        return pred

    @nn.nowrap
    def _tp_active(self) -> bool:
        """True when an ambient mesh carrying `conf.tp_axis` is set."""
        mesh = jax.sharding.get_abstract_mesh()
        return bool(
            mesh is not None
            and self.conf.tp_axis in getattr(mesh, "axis_names", ())
        )

    @nn.nowrap
    def _tp_shard(self, x0, x1, enc0, enc1, mask0, mask1):
        """GSPMD constraints sharding the token axis over `conf.tp_axis`.

        Requires an ambient mesh (`jax.sharding.set_mesh`) whose axis names
        include `tp_axis`/`dp_axis`. This is the TPU-native tensor-parallel
        matcher: instead of the reference's single-GPU width pruning
        (`lightglue.py:506-521`), large keypoint sets are split over chips
        and XLA's GSPMD partitioner inserts the ICI collectives.
        """
        c = self.conf
        if not self._tp_active():
            # no ambient mesh (e.g. param init, single-chip run): no-op so the
            # same conf works everywhere; sharding engages under `set_mesh`.
            return x0, x1, enc0, enc1, mask0, mask1
        P = jax.sharding.PartitionSpec
        wsc = jax.lax.with_sharding_constraint
        tok2 = P(c.dp_axis, c.tp_axis)
        tok3 = P(c.dp_axis, c.tp_axis, None)
        tok4 = P(c.dp_axis, c.tp_axis, None, None)
        return (
            wsc(x0, tok3),
            wsc(x1, tok3),
            wsc(enc0, tok4),
            wsc(enc1, tok4),
            wsc(mask0, tok2),
            wsc(mask1, tok2),
        )

    @nn.nowrap
    def _forward_adaptive_depth(self, x, enc, mask0, mask1, nm, conf_ths):
        """Inference-only adaptive depth that actually SKIPS layers
        (reference `lightglue.py:500-521,569`): a `lax.while_loop` whose body
        applies one transformer layer with params dynamically sliced from the
        (L, ...) scan stack, exiting as soon as the whole batch clears the
        reference stop criterion (ratio of confident tokens >
        `depth_confidence`, per-layer thresholds). The assignment head of the
        exit layer produces the scores, exactly like the reference's
        `log_assignment[i]`.

        TPU notes: one compiled layer body regardless of exit layer; the
        per-iteration param gather is ~MBs from HBM, negligible next to the
        layer compute. The stop check is a scalar reduction riding the same
        program - no extra host round-trips.
        """
        c = self.conf
        L = c.n_layers
        N, M = nm
        B = x.shape[0] // 2
        lparams = self.layers.variables["params"]  # stacked (L, ...) trees
        layer_mod = LGLayer(
            c.descriptor_dim,
            c.num_heads,
            float(c.width_confidence),
            c.dtype,
            fold_out_proj=bool(c.get("fold_out_proj", False)),
            qkv_layout=str(c.get("qkv_layout", "dh3")),
            merge_cross_proj=bool(c.get("merge_cross_proj", False)),
            fused_layer=bool(c.get("fused_layer", False)),
            parent=None,  # standalone template, applied with sliced params
        )
        valid = jnp.concatenate([mask0, mask1], axis=-1)  # (B, 2K)
        num_valid = jnp.maximum(jnp.sum(valid, axis=-1), 1)

        def slice_layer(tree, i):
            return jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False),
                tree,
            )

        def cond_fn(state):
            i, stop, *_ = state
            return (i < L) & ~stop

        def body_fn(state):
            i, _, x, m0, m1 = state
            p_i = slice_layer(lparams, i)
            carry = (x, enc, m0, m1, jnp.asarray(False))
            (xn, _, m0n, m1n, _), out = layer_mod.apply(
                {"params": p_i}, carry, (False, conf_ths[i]), False
            )
            conf = jnp.concatenate([out["conf0"], out["conf1"]], axis=-1)
            # unconfident tokens among the currently-kept set, over the
            # original token count (reference `check_if_stop` with
            # num_points = m + n, `lightglue.py:569-577`)
            kept = jnp.concatenate([m0, m1], axis=-1)
            ratio = 1.0 - jnp.sum(
                (conf < conf_ths[i]) & kept, axis=-1
            ) / num_valid  # (B,)
            # never stop before the last layer's check; all pairs must agree
            stop = jnp.all(ratio > c.depth_confidence) & (i < L - 1)
            return (i + 1, stop, xn, m0n, m1n)

        init = (jnp.int32(0), jnp.asarray(False), x, mask0, mask1)
        i_end, _, x, mask0p, mask1p = jax.lax.while_loop(cond_fn, body_fn, init)
        x0, x1 = x[:B, :N], x[B:, :M]
        mask0, mask1 = mask0[:, :N], mask1[:, :M]

        head = MatchAssignment(
            c.descriptor_dim,
            c.dtype,
            use_kernel=bool(c.get("kernel_exit_head", False)),
            parent=None,
        )
        p_head = slice_layer(lparams["log_assignment"], i_end - 1)
        scores, _, _ = head.apply(
            {"params": p_head},
            x0,
            x1,
            mask0p[:, :N],
            mask1p[:, :M],
            compute_scores=True,
        )
        m0, m1, ms0, ms1 = filter_matches(scores, c.filter_threshold)
        m0 = jnp.where(mask0, m0, -1)
        m1 = jnp.where(mask1, m1, -1)
        return {
            "log_assignment": scores,
            "matches0": m0,
            "matches1": m1,
            "matching_scores0": jnp.where(mask0, ms0, 0.0),
            "matching_scores1": jnp.where(mask1, ms1, 0.0),
            "stop_layers": jnp.broadcast_to(i_end, mask0.shape[:1]).astype(
                jnp.int32
            ),
        }

    def loss(self, pred: dict, data: dict):
        """Deep-supervised NLL + confidence BCE, numerics-exact vs the
        reference (`lightglue.py:588-637`): per-layer full (N+1)x(M+1)
        log-assignments with log_sigmoid(-z) dustbins, gamma layer weights
        normalized by their sum, detached confidence BCE with
        dustbin-inclusive argmax targets."""
        c = self.conf
        L = c.n_layers
        gt0 = data["gt_matches0"]
        gt1 = data["gt_matches1"]
        mask0 = pred.get("keypoint_valid0")
        mask1 = pred.get("keypoint_valid1")
        balancing = float(c.loss["nll_balancing"])

        if "all_assignment_nll" in pred:
            # loss.in_scan: the per-layer terms were reduced inside the scan
            nlls = pred["all_assignment_nll"]  # (L, B)
            per_layer = {
                k: pred[f"all_{k}"]
                for k in ("nll_pos", "nll_neg", "num_matchable", "num_unmatchable")
            }
            allm0 = pred["all_argmax0"]  # (L, B, N) incl. dustbin option
            allm1 = pred["all_argmax1"]
        else:
            all_scores = pred["all_log_assignment"]  # (L, B, N, M)

            def layer_nll(scores, z0, z1):
                la = with_dustbins(scores, z0, z1, mask0, mask1)
                out = nll_loss(la, gt0, gt1, nll_balancing=balancing)
                return out["assignment_nll"], out

            nlls, per_layer = jax.vmap(layer_nll)(
                all_scores, pred["all_z0"], pred["all_z1"]
            )  # (L, B)

            def full_argmax(scores, z0, z1):
                la = with_dustbins(scores, z0, z1, mask0, mask1)
                return jnp.argmax(la[:, :-1, :], -1), jnp.argmax(la[:, :, :-1], -2)

            allm0, allm1 = jax.vmap(full_argmax)(
                jax.lax.stop_gradient(all_scores),
                jax.lax.stop_gradient(pred["all_z0"]),
                jax.lax.stop_gradient(pred["all_z1"]),
            )  # (L, B, N), (L, B, M)
        gamma = float(c.loss["gamma"])
        if gamma > 0:
            weights = jnp.asarray([gamma ** (L - 1 - i) for i in range(L)])
        else:
            # reference fallback: linearly increasing depth weights, last = 1
            weights = jnp.asarray([float(i + 1) for i in range(L - 1)] + [1.0])
        weights = weights / jnp.sum(weights)
        nll = jnp.sum(nlls * weights[:, None], axis=0)  # (B,)

        losses = {"total": nll, "assignment_nll": nll}
        for k in ("nll_pos", "nll_neg", "num_matchable", "num_unmatchable"):
            losses[k] = per_layer[k][-1]

        if c.loss["confidence_weight"] > 0 and "all_conf0" in pred:
            # per-layer token confidence predicts whether the layer's match
            # (incl. the dustbin option) agrees with the final layer's
            # (reference `lightglue.py:81-94,620-633`); everything detached.
            def conf_bce(now0, now1, conf0, conf1):
                t0 = (now0 == allm0[-1]).astype(jnp.float32)
                t1 = (now1 == allm1[-1]).astype(jnp.float32)
                eps = 1e-6
                b0 = -(t0 * jnp.log(conf0 + eps) + (1 - t0) * jnp.log(1 - conf0 + eps))
                b1 = -(t1 * jnp.log(conf1 + eps) + (1 - t1) * jnp.log(1 - conf1 + eps))
                if mask0 is not None:
                    s0 = jnp.sum(b0 * mask0, -1) / jnp.maximum(jnp.sum(mask0, -1), 1)
                    s1 = jnp.sum(b1 * mask1, -1) / jnp.maximum(jnp.sum(mask1, -1), 1)
                else:
                    s0, s1 = jnp.mean(b0, -1), jnp.mean(b1, -1)
                return 0.5 * (s0 + s1)

            conf_losses = jax.vmap(conf_bce)(
                allm0[:-1], allm1[:-1], pred["all_conf0"][:-1], pred["all_conf1"][:-1]
            )  # (L-1, B)
            conf_loss = jnp.mean(conf_losses, axis=0)
            losses["confidence"] = conf_loss
            losses["total"] = losses["total"] + c.loss["confidence_weight"] * conf_loss

        metrics = matcher_metrics(pred, data)
        return losses, metrics
