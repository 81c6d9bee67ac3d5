"""gluefactory_tpu — TPU-native local-feature matching framework.

A from-scratch JAX/XLA/Pallas re-design of Glue Factory's capabilities
(reference `gluefactory/__init__.py:1-17`): training and evaluating
feature-extraction and matching pipelines on TPU device meshes.
"""

import logging

__version__ = "0.1.0"
__module_name__ = "gluefactory_tpu"

formatter = logging.Formatter(
    fmt="[%(asctime)s %(name)s %(levelname)s] %(message)s", datefmt="%m/%d/%Y %H:%M:%S"
)
handler = logging.StreamHandler()
handler.setFormatter(formatter)
handler.setLevel(logging.INFO)

logger = logging.getLogger(__module_name__)
logger.setLevel(logging.INFO)
logger.addHandler(handler)
logger.propagate = False


def load_experiment(exp, conf=None, get_last=False, ckpt=None):
    """Re-export of `utils.experiments.load_experiment` (lazy import)."""
    from .utils.experiments import load_experiment as _load

    return _load(exp, conf=conf, get_last=get_last, ckpt=ckpt)
