"""Global paths and policies.

TPU-native analog of the reference's ``gluefactory/settings.py:1-12``: the same
three roots (data / training / eval), overridable via environment variables so
multi-host TPU workers can point at shared storage (GCS fuse mounts, NFS).
"""

import os
from pathlib import Path

root = Path(__file__).parent.parent  # top-level directory

DATA_PATH = Path(os.environ.get("GLUEFACTORY_DATA", root / "data"))
TRAINING_PATH = Path(os.environ.get("GLUEFACTORY_TRAINING", root / "outputs/training"))
EVAL_PATH = Path(os.environ.get("GLUEFACTORY_EVAL", root / "outputs/results"))

# Whether checkpoint restore may unpickle arbitrary objects (mirrors the
# reference's ALLOW_PICKLE gate, `settings.py:11`). Orbax checkpoints are
# pytree-structured so this only affects legacy torch-weight conversion.
ALLOW_PICKLE = False
