"""Flat image-folder dataset (reference `gluefactory/datasets/image_folder.py:15-59`)."""

from .image_pairs import ImageFolder

__main_class__ = "ImageFolder"
__all__ = ["ImageFolder"]
