"""Pytree/array helpers (reference `gluefactory/utils/tensor.py:13-48`).

Works uniformly over nested dicts of jnp/np arrays ("data dicts"). In JAX
there is no `.to(device)`; `batch_to_device` becomes `jax.device_put` with an
optional sharding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def map_tensor(input_, func):
    if isinstance(input_, str) or input_ is None:
        return input_
    if isinstance(input_, (jnp.ndarray, np.ndarray, jax.Array)):
        return func(input_)
    if isinstance(input_, dict):
        return {k: map_tensor(v, func) for k, v in input_.items()}
    if isinstance(input_, (list, tuple)):
        return type(input_)(map_tensor(v, func) for v in input_)
    return input_  # scalars, Pose/Camera pytrees handled by caller via jax.tree


def batch_to_device(batch, sharding=None, non_blocking=True):
    """Put all arrays of a (possibly nested) batch on device(s)."""

    def _put(x):
        if isinstance(x, np.ndarray) or isinstance(x, jax.Array):
            return jax.device_put(x, sharding)
        return x

    return jax.tree.map(_put, batch)


def rbd(data: dict) -> dict:
    """Remove batch dimension from all arrays in a data dict."""
    return {
        k: v[0] if hasattr(v, "ndim") and v.ndim >= 1 else v for k, v in data.items()
    }


def _first_array(d):
    for v in d.values():
        if isinstance(v, dict):
            a = _first_array(v)
            if a is not None:
                return a
        elif hasattr(v, "ndim") and getattr(v, "ndim", 0) >= 1:
            return v
    return None


def index_batch(tensor_dict):
    """Iterate over the items of a batched data dict."""
    arr = _first_array(tensor_dict)
    assert arr is not None, "no array leaves in batch"
    for i in range(arr.shape[0]):
        yield map_tensor(tensor_dict, lambda t: t[i])
