"""Layered configuration system.

A small, dependency-free replacement for OmegaConf providing the subset the
reference relies on (SURVEY.md §1-L1, §5.6; reference `models/base_model.py:13-22`,
`train.py:1456-1463`): nested dict configs with attribute access, recursive
merge (class defaults -> YAML file -> CLI dotlist), struct mode (merging an
unknown key into a frozen-schema config is an error), read-only freezing, and
``"???"`` mandatory-value markers.

Design: a ``Config`` wraps a plain nested dict. All mutation goes through
``merge_``; ``set_readonly(True)`` makes any mutation raise. Values are parsed
with YAML semantics in dotlists (``a.b=3`` -> int, ``x=[1,2]`` -> list).
"""

from __future__ import annotations

import copy
from typing import Any, Iterator, Mapping

import yaml

MANDATORY = "???"


class ConfigError(Exception):
    pass


class ConfigKeyError(ConfigError, KeyError):
    pass


class ConfigReadOnlyError(ConfigError):
    pass


class MandatoryValueError(ConfigError):
    pass


def _is_mapping(x: Any) -> bool:
    return isinstance(x, (dict, Config))


class Config(Mapping):
    """Nested attribute-access config with struct/readonly semantics."""

    __slots__ = ("_data", "_readonly", "_struct")

    def __init__(self, data: Mapping | None = None):
        object.__setattr__(self, "_data", {})
        object.__setattr__(self, "_readonly", False)
        object.__setattr__(self, "_struct", False)
        if data is not None:
            for k, v in dict(data).items():
                self._data[k] = self._wrap(v)

    # -- construction helpers -------------------------------------------------
    @staticmethod
    def _wrap(v: Any) -> Any:
        if isinstance(v, Config):
            return Config(v.to_dict())
        if isinstance(v, dict):
            return Config(v)
        if isinstance(v, (list, tuple)):
            return [Config._wrap(x) for x in v]
        return v

    @classmethod
    def load(cls, path) -> "Config":
        with open(path, "r") as f:
            data = yaml.safe_load(f) or {}
        if not isinstance(data, dict):
            raise ConfigError(f"top-level YAML in {path} must be a mapping")
        return cls(data)

    @classmethod
    def from_dotlist(cls, items) -> "Config":
        conf = cls()
        for item in items:
            if "=" not in item:
                raise ConfigError(f"dotlist item {item!r} must be key=value")
            key, value = item.split("=", 1)
            value = yaml.safe_load(value)
            if isinstance(value, str):
                # YAML 1.1 misses bare scientific floats like "1e-3"
                try:
                    value = float(value)
                except ValueError:
                    pass
            node: dict = conf._data
            parts = key.strip().split(".")
            for p in parts[:-1]:
                nxt = node.get(p)
                if not isinstance(nxt, Config):
                    nxt = Config()
                    node[p] = nxt
                node = nxt._data
            node[parts[-1]] = cls._wrap(value)
        return conf

    # -- mapping protocol -----------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        try:
            v = self._data[key]
        except KeyError:
            raise ConfigKeyError(key)
        if v == MANDATORY:
            raise MandatoryValueError(f"config key '{key}' is mandatory ('???')")
        return v

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def __contains__(self, key) -> bool:
        return key in self._data

    def __getattr__(self, key: str) -> Any:
        if key.startswith("_"):
            raise AttributeError(key)
        try:
            return self[key]
        except ConfigKeyError:
            raise AttributeError(f"config has no key '{key}'")

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __setitem__(self, key: str, value: Any) -> None:
        if self._readonly:
            raise ConfigReadOnlyError(f"config is read-only (setting '{key}')")
        if self._struct and key not in self._data:
            raise ConfigKeyError(f"key '{key}' not in struct config")
        self._data[key] = self._wrap(value)

    def get(self, key: str, default: Any = None) -> Any:
        try:
            return self[key]
        except (ConfigKeyError, MandatoryValueError):
            return default

    # -- merge ----------------------------------------------------------------
    def merge_(self, other: Mapping) -> "Config":
        """In-place recursive merge; `other` wins. Respects struct mode."""
        if self._readonly:
            raise ConfigReadOnlyError("config is read-only")
        other = other if isinstance(other, Config) else Config(other)
        for k, v in other._data.items():
            if k not in self._data:
                if self._struct:
                    raise ConfigKeyError(f"key '{k}' not in struct config")
                self._data[k] = self._wrap(v)
            elif isinstance(self._data[k], Config) and _is_mapping(v):
                # child keeps its own struct flag (set via set_struct recursion;
                # subtrees may be explicitly re-opened as extension points)
                self._data[k].merge_(v)
            else:
                self._data[k] = self._wrap(v)
        return self

    @staticmethod
    def merge(*configs: Mapping) -> "Config":
        out = Config()
        for c in configs:
            if c is None:
                continue
            out.merge_(c)
        return out

    # -- modes ----------------------------------------------------------------
    def set_readonly(self, flag: bool = True) -> "Config":
        object.__setattr__(self, "_readonly", flag)
        for v in self._data.values():
            if isinstance(v, Config):
                v.set_readonly(flag)
        return self

    def set_struct(self, flag: bool = True) -> "Config":
        object.__setattr__(self, "_struct", flag)
        for v in self._data.values():
            if isinstance(v, Config):
                v.set_struct(flag)
        return self

    # -- export ---------------------------------------------------------------
    def to_dict(self) -> dict:
        def conv(v):
            if isinstance(v, Config):
                return v.to_dict()
            if isinstance(v, list):
                return [conv(x) for x in v]
            return copy.deepcopy(v)

        return {k: conv(v) for k, v in self._data.items()}

    def to_yaml(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    def save(self, path) -> None:
        with open(path, "w") as f:
            f.write(self.to_yaml())

    def check_mandatory(self, prefix: str = "") -> None:
        for k, v in self._data.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(v, Config):
                v.check_mandatory(name)
            elif v == MANDATORY:
                raise MandatoryValueError(f"mandatory config key '{name}' not set")

    def __repr__(self) -> str:
        return f"Config({self.to_dict()!r})"

    def __eq__(self, other) -> bool:
        if isinstance(other, Config):
            return self.to_dict() == other.to_dict()
        if isinstance(other, dict):
            return self.to_dict() == other
        return NotImplemented

    def __deepcopy__(self, memo):
        new = Config(self.to_dict())
        object.__setattr__(new, "_struct", self._struct)
        return new


def load_config(path=None, dotlist=(), base: Mapping | None = None) -> Config:
    """YAML file + dotlist overrides over an optional base config."""
    layers = []
    if base is not None:
        layers.append(base)
    if path is not None:
        layers.append(Config.load(path))
    if dotlist:
        layers.append(Config.from_dotlist(dotlist))
    return Config.merge(*layers)
