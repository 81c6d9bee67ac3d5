"""Sharded matching: scale the keypoint axis across chips.

The reference's only scaling lever for large keypoint sets is width pruning
(`lightglue.py:506-521`, single GPU). On a TPU mesh we instead *shard the
keypoint (token) axis* over the "model" axis (SURVEY.md §5.7): each chip
holds N/tp keypoints, self-attention all-gathers K/V over ICI
(Ulysses-style), and the assignment matrix is computed on row-shards with
softmax statistics exchanged via psum. Data parallelism rides the "data"
axis simultaneously.

These primitives compose under `shard_map` and are exercised on the virtual
8-device CPU mesh in tests and the driver dryrun.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def _attention_allgather_kv(q, k, v, mask, axis_name):
    """Block of self-attention with the token axis sharded.

    q: (B, H, n_local, D); k/v: (B, H, n_local, D); mask: (B, n_local).
    K/V/mask are all-gathered over `axis_name` -> full attention for the
    local queries. Communication: one all-gather of K, V over ICI.
    """
    k_full = jax.lax.all_gather(k, axis_name, axis=2, tiled=True)
    v_full = jax.lax.all_gather(v, axis_name, axis=2, tiled=True)
    mask_full = jax.lax.all_gather(mask, axis_name, axis=1, tiled=True)
    scale = q.shape[-1] ** -0.5
    sim = jnp.einsum("bhnd,bhmd->bhnm", q, k_full) * scale
    sim = jnp.where(mask_full[:, None, None, :], sim, -1e9)
    attn = jax.nn.softmax(sim, axis=-1)
    any_valid = jnp.any(mask_full, axis=-1)[:, None, None, None]
    attn = jnp.where(any_valid, attn, jnp.zeros_like(attn))
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v_full)


def sharded_self_attention(mesh: Mesh, axis_name: str = "model"):
    """Build a jitted token-sharded attention fn over `mesh`.

    Inputs (B, H, N, D) with N sharded over `axis_name`; batch sharded over
    "data". Returns fn(q, k, v, mask) -> (B, H, N, D) with the same sharding.
    """
    qkv_spec = P("data", None, axis_name, None)
    mask_spec = P("data", axis_name)

    fn = shard_map(
        partial(_attention_allgather_kv, axis_name=axis_name),
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, mask_spec),
        out_specs=qkv_spec,
    )
    return jax.jit(fn)


def _row_sharded_log_double_softmax(sim, z0, z1, mask0, mask1, axis_name):
    """Double-softmax assignment on row shards of the similarity matrix.

    sim: (B, n_local, M) rows sharded; columns full. The column softmax
    (axis=-2) needs cross-shard max/sum -> psum/pmax over `axis_name`.
    """
    sim = jnp.where(mask0[:, :, None] & mask1[:, None, :], sim, -1e9)
    # row softmax is local
    scores0 = jax.nn.log_softmax(sim, axis=2)
    # column softmax across shards: logsumexp with psum
    cmax = jax.lax.pmax(jnp.max(sim, axis=1, keepdims=True), axis_name)
    csum = jax.lax.psum(
        jnp.sum(jnp.exp(sim - cmax), axis=1, keepdims=True), axis_name
    )
    scores1 = sim - cmax - jnp.log(jnp.maximum(csum, 1e-30))
    certainties = jax.nn.log_sigmoid(z0)[:, :, None] + jax.nn.log_sigmoid(z1)[:, None, :]
    out = scores0 + scores1 + certainties
    return jnp.where(mask0[:, :, None] & mask1[:, None, :], out, -1e9)


def sharded_assignment(mesh: Mesh, axis_name: str = "model"):
    """Row-sharded LightGlue assignment over the mesh."""
    fn = shard_map(
        partial(_row_sharded_log_double_softmax, axis_name=axis_name),
        mesh=mesh,
        in_specs=(
            P("data", axis_name, None),
            P("data", axis_name),
            P("data", None),
            P("data", axis_name),
            P("data", None),
        ),
        out_specs=P("data", axis_name, None),
    )
    return jax.jit(fn)


def shard_tokens(x, mesh: Mesh, token_axis: int = 1):
    """Device-put with the token axis sharded over "model" and batch over "data"."""
    spec = [None] * x.ndim
    spec[0] = "data"
    spec[token_axis] = "model"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
