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
import jax.numpy as jnp

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
        # one batch-2B extractor call when shapes match. Measured SLOWER on
        # v5e (46 vs 38 ms/batch at B=8, 640x480 — the doubled conv batch
        # crosses a memory cliff), so off by default; useful on larger chips.
        "stack_views": False,
        # fork's keypoint-rotation augmentation
        # (reference `two_view_pipeline.py:161-276`): rotate view-1 keypoint
        # *positions* fed to the matcher around the image center; GT labels
        # stay computed from the unrotated geometry, teaching the matcher
        # in-plane rotation robustness. Needs an "aug" rng in apply().
        "kp_rotation": {"p": 0.0, "max_angle": 180.0},
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
        # when both views share shapes and there is no cache, stack them into
        # one extractor call (better MXU utilization, one dispatch)
        v0, v1 = data["view0"], data["view1"]
        can_stack = (
            self.conf.get("stack_views", True)
            and self.has("extractor")
            and "cache" not in v0
            and "cache" not in v1
            and "image" in v0
            and "image" in v1
            and v0["image"].shape == v1["image"].shape
        )
        if can_stack:
            stacked = {
                "image": jnp.concatenate([v0["image"], v1["image"]], axis=0)
            }
            if "image_size" in v0:
                stacked["image_size"] = jnp.concatenate(
                    [v0["image_size"], v1["image_size"]], axis=0
                )
            if "specular_mask" in v0 and "specular_mask" in v1:
                stacked["specular_mask"] = jnp.concatenate(
                    [v0["specular_mask"], v1["specular_mask"]], axis=0
                )
            both = self.extractor(stacked)
            B = v0["image"].shape[0]
            pred0 = {k: p[:B] for k, p in both.items()}
            pred1 = {k: p[B:] for k, p in both.items()}
        else:
            pred0 = self.extract_view(data, "0")
            pred1 = self.extract_view(data, "1")
        pred = {**suffix_keys(pred0, "0"), **suffix_keys(pred1, "1")}

        if train and self.has("ground_truth") and self.conf.run_gt_in_forward:
            gt_pred = self.ground_truth({**data, **pred})
            pred.update(gt_pred)

        rot_conf = self.conf.get("kp_rotation", {})
        if train and rot_conf and rot_conf.get("p", 0.0) > 0:
            pred = self._apply_keypoint_rotation(data, pred, rot_conf)

        if self.has("matcher"):
            pred = {**pred, **self.matcher({**data, **pred}, train=train)}
        if self.has("filter"):
            pred = {**pred, **self.filter({**data, **pred}, train=train)}
        if self.has("solver"):
            pred = {**pred, **self.solver({**data, **pred}, train=train)}
        return pred

    def _apply_keypoint_rotation(self, data: dict, pred: dict, rot_conf) -> dict:
        """Rotate view-1 keypoint positions by a random per-item angle."""
        import jax

        key = self.make_rng("aug")
        kpts = pred["keypoints1"]
        B = kpts.shape[0]
        k_angle, k_apply = jax.random.split(key)
        max_a = jnp.deg2rad(rot_conf.get("max_angle", 180.0))
        angle = jax.random.uniform(k_angle, (B,), minval=-max_a, maxval=max_a)
        apply_it = jax.random.uniform(k_apply, (B,)) < rot_conf["p"]
        angle = jnp.where(apply_it, angle, 0.0)
        size = data["view1"].get("image_size")
        center = (
            size / 2.0 if size is not None else jnp.mean(kpts, axis=1)
        )  # (B, 2)
        c, s = jnp.cos(angle), jnp.sin(angle)
        R = jnp.stack([c, -s, s, c], -1).reshape(B, 2, 2)
        rotated = (
            jnp.einsum("bij,bnj->bni", R, kpts - center[:, None]) + center[:, None]
        )
        out = dict(pred)
        out["keypoints1"] = rotated
        out["kp_rotation_angle"] = angle
        return out

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
