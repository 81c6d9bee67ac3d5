"""DeepLSD line detector wrapper (reference `gluefactory/models/lines/deeplsd.py:9-106`).

Gated on the external `deeplsd` package (host torch network). The LSD
detector (`lines/lsd.py`) is the always-available line source.
"""

from __future__ import annotations

from ..base_model import BaseModel

__main_class__ = "DeepLSD"


class DeepLSD(BaseModel):
    default_conf = {
        "max_num_lines": 250,
        "min_length": 15,
        "weights": None,
    }
    required_data_keys = ("image",)

    def setup(self):
        pass

    def _forward(self, data: dict, train: bool = False) -> dict:
        try:
            import deeplsd  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "DeepLSD needs the external `deeplsd` package; use "
                "`lines.lsd` for the built-in detector"
            ) from e
        raise NotImplementedError(
            "host DeepLSD execution is gated until the package is available"
        )

    def loss(self, pred, data):
        raise NotImplementedError
