"""Model registry (reference `gluefactory/models/__init__.py:7-28`)."""

from ..core.registry import resolve_class
from .base_model import BaseModel


def get_model(name: str) -> type:
    """Resolve a model class by name, with extractor/matcher/line fallbacks."""
    return resolve_class(
        name,
        __name__,
        BaseModel,
        prefixes=("", "extractors.", "matchers.", "lines.", "backbones."),
    )
