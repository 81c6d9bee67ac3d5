"""Metric accumulators, RNG discipline, misc
(reference `gluefactory/utils/tools.py:17-276`).

Host-side pure-numpy accumulators used by the trainer and eval harness.
JAX RNG is explicit (key threading) so the reference's `fork_rng` state
save/restore is unnecessary; `set_seed` covers numpy/python for the host
pipeline.
"""

from __future__ import annotations

import random
import time

import numpy as np


class AverageMetric:
    def __init__(self):
        self._sum = 0.0
        self._num = 0

    def update(self, values):
        v = np.asarray(values, np.float64).ravel()
        v = v[np.isfinite(v)]
        self._sum += v.sum()
        self._num += v.size

    def compute(self):
        return self._sum / self._num if self._num else np.nan


class FAverageMetric(AverageMetric):
    """Average ignoring non-finite values (same as AverageMetric here)."""


class MedianMetric:
    def __init__(self):
        self._vals = []

    def update(self, values):
        self._vals.append(np.asarray(values, np.float64).ravel())

    def compute(self):
        if not self._vals:
            return np.nan
        v = np.concatenate(self._vals)
        v = v[np.isfinite(v)]
        return np.median(v) if v.size else np.nan


class QuantileMetric:
    def __init__(self, q=0.05):
        self.q = q
        self._vals = []

    def update(self, values):
        self._vals.append(np.asarray(values, np.float64).ravel())

    def compute(self):
        if not self._vals:
            return np.nan
        v = np.concatenate(self._vals)
        v = v[np.isfinite(v)]
        return np.quantile(v, self.q) if v.size else np.nan


class RecallMetric:
    def __init__(self, ths):
        self.ths = np.atleast_1d(ths)
        self._vals = []

    def update(self, values):
        self._vals.append(np.asarray(values, np.float64).ravel())

    def compute(self):
        if not self._vals:
            return [np.nan] * len(self.ths)
        v = np.concatenate(self._vals)
        out = [(v <= th).mean() if v.size else np.nan for th in self.ths]
        return out if len(out) > 1 else out[0]


def cal_error_auc(errors, thresholds):
    """AUC of the recall curve at error thresholds
    (reference `utils/tools.py:137-151`)."""
    errors = np.sort(np.asarray(errors, np.float64))
    errors = errors[np.isfinite(errors)]
    if errors.size == 0:
        return [0.0] * len(thresholds)
    recall = (np.arange(len(errors)) + 1) / len(errors)
    errors = np.r_[0.0, errors]
    recall = np.r_[0.0, recall]
    aucs = []
    for t in thresholds:
        last_index = np.searchsorted(errors, t)
        r = np.r_[recall[:last_index], recall[last_index - 1]]
        e = np.r_[errors[:last_index], t]
        aucs.append(np.trapezoid(r, x=e) / t)
    return aucs


class AUCMetric:
    def __init__(self, thresholds, elements=None):
        self.thresholds = (
            thresholds if isinstance(thresholds, (list, tuple)) else [thresholds]
        )
        self._elements = [] if elements is None else [np.asarray(elements).ravel()]

    def update(self, values):
        self._elements.append(np.asarray(values, np.float64).ravel())

    def compute(self):
        if not self._elements:
            return np.nan
        v = np.concatenate(self._elements)
        aucs = cal_error_auc(v, self.thresholds)
        return aucs if len(aucs) > 1 else aucs[0]


class PRMetric:
    """Accumulates (labels, predictions) for PR curves."""

    def __init__(self):
        self.labels = []
        self.predictions = []

    def update(self, labels, predictions, mask=None):
        labels = np.asarray(labels).ravel()
        predictions = np.asarray(predictions).ravel()
        if mask is not None:
            m = np.asarray(mask).ravel()
            labels, predictions = labels[m], predictions[m]
        self.labels.append(labels)
        self.predictions.append(predictions)

    def compute(self):
        return np.concatenate(self.labels), np.concatenate(self.predictions)


class Timer:
    """Context-manager wall timer (reference `utils/tools.py:170-190`)."""

    def __init__(self, name=None):
        self.name = name

    def __enter__(self):
        self.tstart = time.time()
        return self

    def __exit__(self, *args):
        self.duration = time.time() - self.tstart
        if self.name is not None:
            print(f"[{self.name}] Elapsed: {self.duration}")


def get_class(mod_path, base_class):
    """Find the unique subclass of base_class in a module
    (reference `utils/tools.py:193-207`)."""
    import importlib
    import inspect

    mod = importlib.import_module(mod_path)
    classes = [
        c
        for _, c in inspect.getmembers(mod, inspect.isclass)
        if issubclass(c, base_class) and c is not base_class and c.__module__ == mod.__name__
    ]
    assert len(classes) == 1, classes
    return classes[0]


def set_seed(seed: int):
    """Seed host RNGs (JAX keys are threaded explicitly)."""
    random.seed(seed)
    np.random.seed(seed)
