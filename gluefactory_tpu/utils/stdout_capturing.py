"""Tee stdout/stderr to a log file
(reference `gluefactory/utils/stdout_capturing.py:54-141`).

Context manager: `with capture_outputs(path): ...` mirrors everything the
process prints into `path`, stripping tqdm carriage-return spam on close.
"""

from __future__ import annotations

import re
import sys
from contextlib import contextmanager
from pathlib import Path


class _Tee:
    def __init__(self, stream, fh):
        self.stream = stream
        self.fh = fh

    def write(self, data):
        self.stream.write(data)
        self.fh.write(data)

    def flush(self):
        self.stream.flush()
        self.fh.flush()

    def isatty(self):
        return False


def _clean_backspaces(text: str) -> str:
    """Apply \\r and \\b so progress bars collapse to their final state."""
    lines = []
    for raw in text.split("\n"):
        parts = raw.split("\r")
        line = parts[-1]
        for p in reversed(parts[:-1]):
            if len(line) < len(p):
                line = p[: len(p) - len(line)] + line if False else line + p[len(line):]
        lines.append(re.sub(".\x08", "", line))
    return "\n".join(lines)


@contextmanager
def capture_outputs(path):
    import logging

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "a") as fh:
        out, err = sys.stdout, sys.stderr
        sys.stdout = _Tee(out, fh)
        sys.stderr = _Tee(err, fh)
        # logging handlers hold a direct reference to the original stderr
        # stream (captured at handler creation), bypassing the tee — mirror
        # the log records into the file explicitly. The package logger has
        # propagate=False, so attach to it AND the root logger.
        handler = logging.StreamHandler(fh)
        targets = [logging.getLogger(), logging.getLogger("gluefactory_tpu")]
        for lg in targets:
            for h in lg.handlers:
                if getattr(h, "formatter", None) is not None:
                    handler.setFormatter(h.formatter)
                    break
        for lg in targets:
            lg.addHandler(handler)
        try:
            yield
        finally:
            sys.stdout = out
            sys.stderr = err
            for lg in targets:
                lg.removeHandler(handler)
    try:
        text = path.read_text()
        path.write_text(_clean_backspaces(text))
    except OSError:
        pass
