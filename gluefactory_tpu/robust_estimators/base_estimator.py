"""BaseEstimator (reference `gluefactory/robust_estimators/base_estimator.py:6-34`)."""

from __future__ import annotations

from ..core.config import Config


class BaseEstimator:
    base_default_conf = {"name": "???", "ransac_th": "???"}
    default_conf = {}
    required_data_keys = ()

    def __init__(self, conf=None):
        merged = Config(self.base_default_conf)
        for klass in reversed(type(self).__mro__):
            dc = klass.__dict__.get("default_conf")
            if dc:
                merged.merge_(dc)
        if conf:
            merged.merge_(conf)
        merged.set_readonly(True)
        self.conf = merged
        self._init(merged)

    def _init(self, conf):
        pass

    def __call__(self, data: dict) -> dict:
        for key in self.required_data_keys:
            assert key in data, f"missing key {key}"
        return self._forward(data)

    def _forward(self, data: dict) -> dict:
        raise NotImplementedError
