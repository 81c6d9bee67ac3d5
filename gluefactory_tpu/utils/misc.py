"""View-manipulation helpers (reference `gluefactory/utils/misc.py:6-57`)."""

from __future__ import annotations

import jax.numpy as jnp


def to_view(data: dict, i: str) -> dict:
    return data[f"view{i}"]


def get_view(data: dict, pred: dict, i: str):
    data_i = data[f"view{i}"]
    pred_i = {
        k[: -len(i)]: v for k, v in pred.items() if k.endswith(i) and k[-len(i):] == i
    }
    return data_i, pred_i


def get_twoview(data: dict, i: str, j: str) -> dict:
    """Extract the (i, j) pair from a triplet batch as a two-view data dict."""
    out = {k: v for k, v in data.items() if not k.startswith("view") and "to" not in k}
    out["view0"] = data[f"view{i}"]
    out["view1"] = data[f"view{j}"]
    if f"T_{i}to{j}" in data:
        out["T_0to1"] = data[f"T_{i}to{j}"]
    if f"H_{i}to{j}" in data:
        out["H_0to1"] = data[f"H_{i}to{j}"]
    return out


def _cat(xs):
    if hasattr(xs[0], "ndim"):
        return jnp.concatenate(xs, axis=0)
    if isinstance(xs[0], dict):
        return {k: _cat([x[k] for x in xs]) for k in xs[0]}
    # Pose/Camera pytrees
    import jax

    return jax.tree.map(lambda *leaves: jnp.concatenate(leaves, axis=0), *xs)


def stack_twoviews(data: dict, is_pred: bool = False) -> dict:
    """Stack triplet pairs (0,1), (0,2), (1,2) along the batch axis
    (reference `utils/misc.py:24-44`)."""
    pairs = (("0", "1"), ("0", "2"), ("1", "2"))
    if is_pred:
        # invert unstack_twoviews: gather per-pair suffixed keys back into
        # one 3x-batch dict
        out = {}
        suffixes = [f"_{i}to{j}" for i, j in pairs]
        bases = {
            k[: -len(suffixes[0])]
            for k in data
            if k.endswith(suffixes[0])
        }
        for base in bases:
            out[base] = _cat([data[base + s] for s in suffixes])
        for k, v in data.items():
            if not any(k.endswith(s) for s in suffixes):
                out[k] = v
        return out
    out = {}
    out["view0"] = _cat([data[f"view{i}"] for i, _ in pairs])
    out["view1"] = _cat([data[f"view{j}"] for _, j in pairs])
    for key, base in (("T", "T_0to1"), ("H", "H_0to1")):
        ks = [f"{key}_{i}to{j}" for i, j in pairs]
        if all(k in data for k in ks):
            out[base] = _cat([data[k] for k in ks])
    for k, v in data.items():
        if not k.startswith("view") and "to" not in k and k not in out:
            if hasattr(v, "ndim"):
                out[k] = jnp.concatenate([v, v, v], axis=0)
            elif isinstance(v, list):
                out[k] = v * 3
            else:
                out[k] = v
    return out


def unstack_twoviews(pred: dict, prefix: bool = True) -> dict:
    """Split stacked two-view predictions back into the 3 pairs."""
    pairs = (("0", "1"), ("0", "2"), ("1", "2"))
    out = {}
    for k, v in pred.items():
        if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] % 3 == 0:
            b = v.shape[0] // 3
            for p, (i, j) in enumerate(pairs):
                out[f"{k}_{i}to{j}"] = v[p * b : (p + 1) * b]
        else:
            out[k] = v
    return out
