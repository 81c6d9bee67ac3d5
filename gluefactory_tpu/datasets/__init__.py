"""Dataset registry (reference `gluefactory/datasets/__init__.py:7-26`)."""

from ..core.registry import resolve_class
from .base_dataset import BaseDataset


def get_dataset(name: str) -> type:
    return resolve_class(name, __name__, BaseDataset)
