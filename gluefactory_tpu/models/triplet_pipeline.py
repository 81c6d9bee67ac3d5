"""TripletPipeline: 3 views -> 3 two-view problems
(reference `gluefactory/models/triplet_pipeline.py:23-99`).

Runs the two-view pipeline on the pairs (0,1), (0,2), (1,2), either
sequentially or batch-stacked into a single two-view call
(`stack_twoviews`, which triples the effective batch — the TPU-friendly
mode). Falls back to plain two-view when the batch has no `view2`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..utils.misc import get_twoview, stack_twoviews, unstack_twoviews
from .base_model import BaseModel
from .two_view_pipeline import TwoViewPipeline

__main_class__ = "TripletPipeline"


class TripletPipeline(TwoViewPipeline):
    default_conf = {"batch_triplets": True}

    def _forward(self, data: dict, train: bool = False) -> dict:
        if "view2" not in data:
            return super()._forward(data, train=train)
        if self.conf.batch_triplets:
            # stack the 3 pairs along the batch axis -> one two-view call
            stacked = stack_twoviews(data)
            pred = super()._forward(stacked, train=train)
            return unstack_twoviews(pred)
        pred = {}
        for i, j in (("0", "1"), ("0", "2"), ("1", "2")):
            pred_ij = super()._forward(get_twoview(data, i, j), train=train)
            pred.update({f"{k}_{i}to{j}": v for k, v in pred_ij.items()})
        return pred

    @nn.nowrap
    def make_loss_fn(self):
        two_view_loss = super().make_loss_fn()

        def loss_fn(pred: dict, data: dict):
            if "view2" not in data:
                return two_view_loss(pred, data)
            if self.conf.batch_triplets:
                # stacked predictions: loss over the tripled batch
                stacked_data = stack_twoviews(data)
                stacked_pred = stack_twoviews(pred, is_pred=True)
                losses, metrics = two_view_loss(stacked_pred, stacked_data)
                # fold the 3x batch back: mean over pair axis
                def fold(v):
                    if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] % 3 == 0:
                        b = v.shape[0] // 3
                        return jnp.mean(v.reshape(3, b, *v.shape[1:]), axis=0)
                    return v

                losses = {k: fold(v) for k, v in losses.items()}
                metrics = {k: fold(v) for k, v in metrics.items()}
                return losses, metrics
            total = 0
            losses, metrics = {}, {}
            for i, j in (("0", "1"), ("0", "2"), ("1", "2")):
                pred_ij = {
                    k[: -len(f"_{i}to{j}")]: v
                    for k, v in pred.items()
                    if k.endswith(f"_{i}to{j}")
                }
                l_ij, m_ij = two_view_loss(pred_ij, get_twoview(data, i, j))
                total = total + l_ij["total"]
                losses.update({f"{k}_{i}to{j}": v for k, v in l_ij.items()})
                metrics.update({f"{k}_{i}to{j}": v for k, v in m_ij.items()})
            losses["total"] = total / 3.0
            return losses, metrics

        return loss_fn
