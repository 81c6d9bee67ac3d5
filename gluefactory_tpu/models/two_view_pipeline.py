"""TwoViewPipeline: extractor -> ground_truth -> matcher -> filter -> solver
(reference `gluefactory/models/two_view_pipeline.py:26-429`).

The composition contract is the reference's: submodels are configured by name
under `extractor/matcher/filter/solver/ground_truth` conf blocks, per-view
extraction outputs get `0`/`1` suffixes, features from dataset caches bypass
extraction. TPU-first difference: GT generation always runs inside the
forward graph when training (`run_gt_in_forward`), so one jitted program
covers extract+gt+match+loss — no host round-trips in the hot loop.
"""

from __future__ import annotations

import flax.linen as nn

from . import get_model
from .base_model import BaseModel

__main_class__ = "TwoViewPipeline"


def suffix_keys(pred: dict, suffix: str) -> dict:
    return {k + suffix: v for k, v in pred.items()}


class TwoViewPipeline(BaseModel):
    components = ["extractor", "matcher", "filter", "solver", "ground_truth"]
    open_conf_keys = ("extractor", "matcher", "filter", "solver", "ground_truth")
    default_conf = {
        "extractor": {"name": None},
        "matcher": {"name": None},
        "filter": {"name": None},
        "solver": {"name": None},
        "ground_truth": {"name": None},
        "allow_no_extract": False,
        "run_gt_in_forward": True,
    }
    required_data_keys = ("view0", "view1")

    def setup(self):
        for k in self.components:
            sub_conf = self.conf.get(k)
            if sub_conf and sub_conf.get("name"):
                cls = get_model(sub_conf["name"])
                setattr(self, k, cls.from_conf(sub_conf))
            else:
                setattr(self, k, None)

    def has(self, name: str) -> bool:
        sub = self.conf.get(name)
        return bool(sub and sub.get("name"))

    def extract_view(self, data: dict, i: str) -> dict:
        """Run the extractor on view i, honoring feature caches
        (reference `two_view_pipeline.py:104-125`)."""
        data_i = data[f"view{i}"]
        pred_i = dict(data_i.get("cache", {}))
        skip_extract = len(pred_i) > 0 and self.conf.allow_no_extract
        if self.has("extractor") and not skip_extract:
            pred_i = {**self.extractor({**data_i, **pred_i}), **pred_i}
        return pred_i

    def _forward(self, data: dict, train: bool = False) -> dict:
        pred0 = self.extract_view(data, "0")
        pred1 = self.extract_view(data, "1")
        pred = {**suffix_keys(pred0, "0"), **suffix_keys(pred1, "1")}

        if train and self.has("ground_truth") and self.conf.run_gt_in_forward:
            gt_pred = self.ground_truth({**data, **pred})
            pred.update(gt_pred)

        if self.has("matcher"):
            pred = {**pred, **self.matcher({**data, **pred}, train=train)}
        if self.has("filter"):
            pred = {**pred, **self.filter({**data, **pred}, train=train)}
        if self.has("solver"):
            pred = {**pred, **self.solver({**data, **pred}, train=train)}
        return pred

    @nn.nowrap
    def make_loss_fn(self):
        """Sum child losses (reference `two_view_pipeline.py:407-429`).

        Child modules are constructed HERE (outside any jit trace, flax
        requirement); the returned closure is pure.
        """
        subs = []
        for k in ("matcher", "filter", "solver"):
            sub_conf = self.conf.get(k)
            if not (sub_conf and sub_conf.get("name")):
                continue
            cls = get_model(sub_conf["name"])
            if cls.loss is BaseModel.loss:
                continue  # no loss implemented
            subs.append(cls.from_conf(sub_conf))

        def loss_fn(pred: dict, data: dict):
            losses, metrics = {}, {}
            total = 0
            for sub in subs:
                try:
                    losses_i, metrics_i = sub.loss(pred, {**pred, **data})
                except NotImplementedError:
                    continue
                losses.update(losses_i)
                metrics.update(metrics_i)
                total = losses_i["total"] + total
            losses["total"] = total
            return losses, metrics

        return loss_fn

    def loss(self, pred: dict, data: dict):
        return self.make_loss_fn()(pred, data)
