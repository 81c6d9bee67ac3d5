"""Minimal OmegaConf stand-in, just enough to import the read-only reference
torch models (`/root/reference/gluefactory`) inside parity tests. The real
omegaconf is not installed in this environment; the reference only uses
create/merge/set_struct/set_readonly and attribute access on the result.

This is test scaffolding only — the framework itself uses
`gluefactory_tpu.core.config`.
"""

from __future__ import annotations

import copy


class _Node:
    pass


class DictConfig(_Node):
    def __init__(self, data=None):
        object.__setattr__(self, "_data", {})
        object.__setattr__(self, "_struct", False)
        object.__setattr__(self, "_readonly", False)
        for k, v in (data or {}).items():
            self._data[k] = _wrap(v)

    # -- mapping protocol -------------------------------------------------
    def __getitem__(self, k):
        return self._data[k]

    def __setitem__(self, k, v):
        if self._readonly:
            raise RuntimeError("Cannot change read-only config")
        if self._struct and k not in self._data:
            raise KeyError(f"Key '{k}' not in struct config")
        self._data[k] = _wrap(v)

    def __contains__(self, k):
        return k in self._data

    def __iter__(self):
        return iter(self._data)

    def __len__(self):
        return len(self._data)

    def keys(self):
        return self._data.keys()

    def values(self):
        return self._data.values()

    def items(self):
        return self._data.items()

    def get(self, k, default=None):
        return self._data.get(k, default)

    # -- attribute protocol -----------------------------------------------
    def __getattr__(self, k):
        if k.startswith("_"):
            raise AttributeError(k)
        try:
            return self._data[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v

    def __deepcopy__(self, memo):
        new = DictConfig()
        new._data.update({k: copy.deepcopy(v, memo) for k, v in self._data.items()})
        object.__setattr__(new, "_struct", self._struct)
        object.__setattr__(new, "_readonly", self._readonly)
        return new

    def __repr__(self):
        return f"DictConfig({self._data!r})"


class ListConfig(_Node, list):
    pass


def _wrap(v):
    if isinstance(v, _Node):
        return v
    if isinstance(v, dict):
        return DictConfig(v)
    if isinstance(v, (list, tuple)):
        return ListConfig(_wrap(x) for x in v)
    return v


def _unwrap(v):
    if isinstance(v, DictConfig):
        return {k: _unwrap(x) for k, x in v.items()}
    if isinstance(v, ListConfig):
        return [_unwrap(x) for x in v]
    return v


class OmegaConf:
    @staticmethod
    def create(data=None):
        return _wrap(data if data is not None else {})

    @staticmethod
    def merge(*configs):
        out = DictConfig()
        for c in configs:
            _merge_into(out, _wrap(copy.deepcopy(_unwrap(_wrap(c)))))
        return out

    @staticmethod
    def set_struct(conf, flag):
        _set_flag(conf, "_struct", flag)

    @staticmethod
    def set_readonly(conf, flag):
        _set_flag(conf, "_readonly", flag)

    @staticmethod
    def to_container(conf, resolve=False):
        return _unwrap(_wrap(conf))

    @staticmethod
    def is_config(obj):
        return isinstance(obj, _Node)


def _merge_into(dst: DictConfig, src):
    if not isinstance(src, DictConfig):
        raise TypeError(f"cannot merge {type(src)} into DictConfig")
    for k, v in src.items():
        if (
            k in dst._data
            and isinstance(dst._data[k], DictConfig)
            and isinstance(v, DictConfig)
        ):
            _merge_into(dst._data[k], v)
        else:
            dst._data[k] = v


def _set_flag(conf, name, flag):
    if isinstance(conf, DictConfig):
        object.__setattr__(conf, name, flag)
        for v in conf.values():
            _set_flag(v, name, flag)
    elif isinstance(conf, ListConfig):
        for v in conf:
            _set_flag(v, name, flag)
