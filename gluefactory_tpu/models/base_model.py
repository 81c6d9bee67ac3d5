"""BaseModel: conf-merged flax module ABC
(reference `gluefactory/models/base_model.py:13-157`).

Differences from the torch design, forced by JAX:
  - Modules are stateless; parameters live in a pytree created by
    `model.init(...)` and passed to `model.apply(...)`.
  - The conf-merging metaclass becomes `__init_subclass__` accumulating
    `default_conf` over the class hierarchy (same semantics as the
    reference's `MetaModel.__prepare__`).
  - `loss(pred, data)` is a pure function of the forward outputs: models emit
    any auxiliary tensors the loss needs (e.g. per-layer assignments for deep
    supervision) in `pred` when called with `train=True`.
  - `trainable=False` freezing is enforced by the trainer via optax parameter
    masking (see `train/trainer.py`), not in the module.
"""

from __future__ import annotations

import copy
from abc import abstractmethod
from typing import Any, Tuple

import flax.linen as nn

from ..core.config import Config


class BaseModel(nn.Module):
    """Abstract two-phase model: merged static conf + pure forward.

    Subclasses define `default_conf` (class attr, accumulated over bases),
    `required_data_keys`, and implement `setup()` (flax) and `_forward(data)`.
    """

    conf: Any = None

    # NOTE: deliberately un-annotated so the linen dataclass transform does
    # not treat these class-level config attributes as instance fields
    base_default_conf = {
        "name": None,
        "trainable": True,
        "timeit": False,
    }
    default_conf = {}
    required_data_keys = ()
    # conf subtrees that accept arbitrary keys even in struct mode (e.g. the
    # pipeline's per-component confs, which belong to the child model's schema)
    open_conf_keys = ()

    @classmethod
    def merged_default_conf(cls) -> Config:
        """Accumulate default_conf over the MRO (base first)."""
        merged = Config(copy.deepcopy(BaseModel.base_default_conf))
        for klass in reversed(cls.__mro__):
            dc = klass.__dict__.get("default_conf")
            if dc:
                merged.merge_(dc)
        return merged

    @classmethod
    def from_conf(cls, conf: Any = None, **kwargs) -> "BaseModel":
        """Build with user conf merged over the class default chain."""
        merged = cls.merged_default_conf()
        # free merge for dict-valued extension points, struct for the rest:
        # mirror the reference's default_conf freeze (`base_model.py:82-84`)
        if conf:
            merged.set_struct(True)
            for key in cls.open_conf_keys:
                if key in merged and isinstance(merged[key], Config):
                    merged[key].set_struct(False)
            merged.merge_(conf if not isinstance(conf, Config) else conf)
            merged.set_struct(False)
        merged.set_readonly(True)
        return cls(conf=merged, **kwargs)

    def check_required_keys(self, data: dict) -> None:
        def check(d, key):
            if "." in key:
                head, rest = key.split(".", 1)
                return head in d and check(d[head], rest)
            return key in d

        for key in self.required_data_keys:
            if not check(data, key):
                raise ValueError(f"missing required data key: {key}")

    def __call__(self, data: dict, train: bool = False) -> dict:
        self.check_required_keys(data)
        return self._forward(data, train=train)

    @abstractmethod
    def _forward(self, data: dict, train: bool = False) -> dict:
        raise NotImplementedError

    def loss(self, pred: dict, data: dict) -> Tuple[dict, dict]:
        """Return (losses, metrics); each a dict of (B,)-shaped arrays."""
        raise NotImplementedError

    @nn.nowrap
    def make_loss_fn(self):
        """Return a pure (pred, data) -> (losses, metrics) callable.

        Called OUTSIDE jit so composite models can construct their loss
        submodules eagerly (flax forbids Module construction inside a trace;
        @nn.nowrap keeps flax from treating the constructions as children).
        """
        return self.loss
