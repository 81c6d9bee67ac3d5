"""Dynamic-import registries.

Mirrors the reference's dotted-path registries (`gluefactory/models/__init__.py:7-28`,
`datasets/__init__.py:7-26`, `eval/__init__.py:8-24`, `robust_estimators/__init__.py:6-16`)
with a single generic resolver: a name like ``"superpoint"`` or
``"extractors.superpoint"`` or a fully-dotted external path is resolved to a
module, and the target class is found either via a module-level
``__main_class__`` attribute or as the unique subclass of ``base_cls`` defined
in that module.
"""

from __future__ import annotations

import importlib
import inspect


def resolve_class(name: str, base_pkg: str, base_cls: type, prefixes=("",)):
    """Find the class for `name` under `base_pkg`, trying each prefix.

    Resolution order mirrors the reference: try
    ``{base_pkg}.{prefix}{name}`` for each prefix, then `name` as an absolute
    dotted import path.
    """
    candidates = [f"{base_pkg}.{p}{name}" for p in prefixes] + [name]
    errors = []
    for modpath in candidates:
        try:
            mod = importlib.import_module(modpath)
        except ImportError as e:
            # only swallow "module not found" for the candidate itself;
            # re-raise genuine import errors inside an existing module
            if getattr(e, "name", None) and modpath.startswith(e.name):
                errors.append(f"{modpath}: {e}")
                continue
            raise
        main = getattr(mod, "__main_class__", None)
        if main is not None:
            return getattr(mod, main) if isinstance(main, str) else main
        classes = [
            c
            for _, c in inspect.getmembers(mod, inspect.isclass)
            if issubclass(c, base_cls) and c is not base_cls and c.__module__ == mod.__name__
        ]
        if len(classes) == 1:
            return classes[0]
        if len(classes) > 1:
            raise ImportError(
                f"module {modpath} defines multiple {base_cls.__name__} subclasses "
                f"({[c.__name__ for c in classes]}); set __main_class__"
            )
        errors.append(f"{modpath}: no {base_cls.__name__} subclass")
    raise ImportError(f"cannot resolve '{name}':\n  " + "\n  ".join(errors))
