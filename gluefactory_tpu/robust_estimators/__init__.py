"""Estimator registry (reference `gluefactory/robust_estimators/__init__.py:6-16`)."""

from ..core.registry import resolve_class
from .base_estimator import BaseEstimator


def load_estimator(type_: str, estimator: str) -> type:
    return resolve_class(f"{type_}.{estimator}", __name__, BaseEstimator)
