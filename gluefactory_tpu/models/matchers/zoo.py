"""Matcher-zoo adapter: run any matcher in the framework's zoo behind one
`zoo_name` config key
(reference `gluefactory_nonfree/imcui.py:25-126` + `configs/imcui-zoo.yaml`).

The reference wraps the external image-matching-webui zoo so that "any
matcher" plugs into gluefactory's two-view API via a single name. Here that
role is filled TPU-natively by the framework's own zoo: `zoo_name` selects a
preconfigured end-to-end pipeline (sparse extractor+matcher or dense
matcher), `custom` deep-merges overrides, and the output is normalized to
the reference's IMCUI contract: ALIGNED matched keypoint lists
(`keypoints0[i]` matches `keypoints1[i]`), `matches0 = arange` (padded
entries -1), confidences duplicated into keypoint/matching scores, top
`max_num_matches` by confidence (fixed-size + `keypoint_valid*` masks: we
jit, the reference doesn't).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..base_model import BaseModel

__main_class__ = "ZooMatcher"

# preconfigured end-to-end pipelines, the `matcher_zoo` equivalent
ZOO = {
    "superpoint+lightglue": {
        "name": "two_view_pipeline",
        "extractor": {"name": "superpoint", "max_num_keypoints": 1024},
        "matcher": {"name": "lightglue"},
    },
    "aliked+lightglue": {
        "name": "two_view_pipeline",
        "extractor": {"name": "aliked", "max_num_keypoints": 1024},
        "matcher": {"name": "lightglue", "input_dim": 128},
    },
    "disk+lightglue": {
        "name": "two_view_pipeline",
        "extractor": {"name": "disk", "max_num_keypoints": 1024},
        "matcher": {"name": "lightglue", "input_dim": 128},
    },
    "superpoint+superglue": {
        "name": "two_view_pipeline",
        "extractor": {"name": "superpoint", "max_num_keypoints": 1024},
        "matcher": {"name": "superglue"},
    },
    "sift+nn": {
        "name": "two_view_pipeline",
        "extractor": {"name": "sift", "max_num_keypoints": 1024},
        "matcher": {"name": "nearest_neighbor"},
    },
    "keynet+nn": {
        "name": "two_view_pipeline",
        "extractor": {"name": "keynet_affnet_hardnet", "max_num_keypoints": 512},
        "matcher": {"name": "nearest_neighbor"},
    },
    "loftr": {"name": "matchers.loftr"},
    "roma": {"name": "matchers.roma", "sample_num_matches": 1024},
}


class ZooMatcher(BaseModel):
    default_conf = {
        "zoo_name": "superpoint+lightglue",
        "custom": {},  # deep-merged over the zoo entry (reference `custom`)
        "match_threshold": 0.0,
        "max_num_matches": 1024,
    }
    required_data_keys = ("view0", "view1")
    open_conf_keys = ("custom",)

    def setup(self):
        from .. import get_model

        c = self.conf
        if c.zoo_name not in ZOO:
            raise ValueError(
                f"matcher {c.zoo_name!r} not in the zoo; available: "
                f"{sorted(ZOO)}"
            )
        base = {k: v for k, v in ZOO[c.zoo_name].items()}
        custom = dict(c.custom) if c.custom else {}
        name = custom.pop("name", base["name"])
        merged = _deep_merge({k: v for k, v in base.items() if k != "name"}, custom)
        self.pipeline = get_model(name).from_conf(merged)

    def _forward(self, data: dict, train: bool = False) -> dict:
        c = self.conf
        pred = self.pipeline(data, train=False)
        K = int(c.max_num_matches)

        if "sampled_keypoints0" in pred:  # dense models with match sampling
            kp0 = pred["sampled_keypoints0"]
            kp1 = pred["sampled_keypoints1"]
            conf = pred["sampled_scores"]
        else:  # sparse: gather matched pairs, confidence-ranked
            kp0, kp1 = pred["keypoints0"], pred["keypoints1"]
            m0 = pred["matches0"]
            conf = pred["matching_scores0"]
            ok = m0 >= 0
            if "keypoint_valid0" in pred:
                ok = ok & pred["keypoint_valid0"]
            conf = jnp.where(ok, conf, -1.0)
            kp1 = jnp.take_along_axis(
                kp1, jnp.clip(m0, 0, kp1.shape[1] - 1)[..., None], axis=1
            )
        import jax

        conf = jnp.where(conf > float(c.match_threshold), conf, -1.0)
        k = min(K, conf.shape[1])
        top_conf, idx = jax.lax.top_k(conf, k)
        gather = lambda a: jnp.take_along_axis(a, idx[..., None], axis=1)
        kp0s, kp1s = gather(kp0), gather(kp1)
        valid = top_conf > 0
        B = kp0.shape[0]
        if k < K:  # pad to the fixed contract size
            pad = K - k
            kp0s = jnp.pad(kp0s, ((0, 0), (0, pad), (0, 0)))
            kp1s = jnp.pad(kp1s, ((0, 0), (0, pad), (0, 0)))
            top_conf = jnp.pad(top_conf, ((0, 0), (0, pad)))
            valid = jnp.pad(valid, ((0, 0), (0, pad)))
        arange = jnp.broadcast_to(jnp.arange(K)[None], (B, K))
        matches = jnp.where(valid, arange, -1)
        scores = jnp.where(valid, top_conf, 0.0)
        return {
            "keypoints0": jnp.where(valid[..., None], kp0s, 0.0),
            "keypoints1": jnp.where(valid[..., None], kp1s, 0.0),
            "keypoint_scores0": scores,
            "keypoint_scores1": scores,
            "keypoint_valid0": valid,
            "keypoint_valid1": valid,
            "matches0": matches,
            "matches1": matches,
            "matching_scores0": scores,
            "matching_scores1": scores,
        }

    def loss(self, pred, data):
        raise NotImplementedError("ZooMatcher is an inference adapter")


def _is_map(v) -> bool:
    return hasattr(v, "items")  # plain dicts and Config nodes alike


def _deep_merge(base, over) -> dict:
    out = {k: v for k, v in base.items()}
    for k, v in over.items():
        if k in out and _is_map(out[k]) and _is_map(v):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out
