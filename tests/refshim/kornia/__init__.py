"""Minimal kornia shim for importing reference modules in tests.

Only the attribute paths touched at import time / by the functions under
test need to exist; anything else raises if actually called.
"""


class _Stub:
    def __getattr__(self, name):
        return _Stub()

    def __call__(self, *a, **k):
        raise NotImplementedError("kornia shim: not available in tests")


geometry = _Stub()
