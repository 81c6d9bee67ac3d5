"""AOT serving bundles: freeze a trained pipeline into one self-contained
StableHLO artifact.

The reference has no deployment story beyond "install gluefactory + torch and
load the checkpoint" (its eval stack re-instantiates the Python model zoo per
run, `/root/reference/gluefactory/eval/eval_pipeline.py`). Serving on TPU
wants the opposite: a single ahead-of-time-compiled artifact with the weights
baked in as constants, loadable by a process that ships NO model code, no
config system, and no checkpoint reader — just jax. `jax.export` gives
exactly that (versioned StableHLO with multi-platform lowering), so a bundle
here is:

    <dir>/model.stablehlo   serialized Exported (weights inlined)
    <dir>/meta.json         input spec, output keys, conf snapshot, platforms

Fixed shapes by design: XLA serving wants one compiled program per bucket,
not shape polymorphism (SURVEY.md §6 — static shapes are the TPU contract
this whole framework is built on). Export one bundle per (batch, size, K)
bucket; the loader dispatches on the recorded spec.
"""

from __future__ import annotations

import json
from pathlib import Path

ARTIFACT = "model.stablehlo"
META = "meta.json"


def _spec_of(tree):
    import jax

    return jax.tree.map(
        lambda a: {"shape": list(a.shape), "dtype": str(a.dtype)}, tree
    )


def _batch_sharding(mesh, data_axis):
    from jax.sharding import NamedSharding, PartitionSpec

    return NamedSharding(mesh, PartitionSpec(data_axis))


def quantize_variables(variables, dtype="int8", min_size=4096):
    """Per-output-channel symmetric weight quantization for serving: each
    large 2D+ kernel leaf is stored as (int8, f32 scale per last-dim
    column) and dequantized to the compute dtype at trace time — the baked
    artifact shrinks ~4x vs f32 with XLA fusing the dequant into the
    consumer. Small leaves (biases, norms) stay exact. Returns a pytree of
    the same structure with `_Quantized` leaves understood by
    `export_apply` (it maps them back through `dequantize_tree`)."""
    import jax.numpy as jnp

    assert dtype == "int8"

    def q(leaf):
        if leaf.ndim < 2 or leaf.size < min_size or not jnp.issubdtype(
            leaf.dtype, jnp.floating
        ):
            return leaf
        axes = tuple(range(leaf.ndim - 1))
        scale = jnp.max(jnp.abs(leaf.astype(jnp.float32)), axis=axes,
                        keepdims=True)
        scale = jnp.maximum(scale, 1e-12) / 127.0
        ints = jnp.clip(
            jnp.round(leaf.astype(jnp.float32) / scale), -127, 127
        ).astype(jnp.int8)
        return _Quantized(ints, scale.astype(jnp.float32), str(leaf.dtype))

    import jax

    return jax.tree.map(q, variables)


class _Quantized:
    """A quantized weight leaf: int8 values + per-column f32 scales."""

    def __init__(self, ints, scale, orig_dtype):
        self.ints = ints
        self.scale = scale
        self.orig_dtype = orig_dtype

    def dequantize(self):
        import jax.numpy as jnp

        return (self.ints.astype(jnp.float32) * self.scale).astype(
            jnp.dtype(self.orig_dtype)
        )


def dequantize_tree(variables):
    import jax

    return jax.tree.map(
        lambda a: a.dequantize() if isinstance(a, _Quantized) else a,
        variables,
        is_leaf=lambda a: isinstance(a, _Quantized),
    )


def export_apply(model, variables, example_data, platforms=("cpu", "tpu"),
                 mesh=None, data_axis="data"):
    """Export `model.apply(variables, data, train=False)` with the variables
    baked in as constants. Returns the `jax.export.Exported` object.

    With `mesh`, the artifact is exported as an SPMD program over that mesh:
    every input leaf is sharded along its leading (batch) dimension on
    `data_axis` and XLA bakes the collectives in — pod serving from one
    file (the artifact records the device count; reload it on any mesh of
    the same size)."""
    import contextlib

    import jax
    from jax import export

    from ..ops.attention import force_xla_attention

    def serve(data):
        return model.apply(dequantize_tree(variables), data, train=False)

    # multi-platform artifacts cannot contain Pallas kernels (no CPU
    # lowering); the auto attention path would pick them when the tracing
    # process is TPU-attached. TPU-only exports keep the fused kernels.
    guard = (
        contextlib.nullcontext()
        if set(platforms) == {"tpu"}
        else force_xla_attention()
    )
    with guard:
        if mesh is None:
            spec = jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), example_data
            )
            return export.export(jax.jit(serve), platforms=list(platforms))(
                spec
            )
        sh = _batch_sharding(mesh, data_axis)
        spec = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh),
            example_data,
        )
        fn = jax.jit(
            serve,
            in_shardings=(jax.tree.map(lambda _: sh, example_data),),
            out_shardings=sh,
        )
        return export.export(fn, platforms=list(platforms))(spec)


def save_bundle(out_dir, model, variables, example_data,
                platforms=("cpu", "tpu"), conf=None, mesh=None,
                data_axis="data", quantize=None):
    """Export + write a serving bundle directory. Returns the meta dict.
    `quantize="int8"` stores large weights as per-channel int8 constants
    (dequantized in-graph; ~4x smaller artifact)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if quantize is not None:
        variables = quantize_variables(variables, quantize)
    exp = export_apply(
        model, variables, example_data, platforms, mesh=mesh,
        data_axis=data_axis,
    )
    (out_dir / ARTIFACT).write_bytes(exp.serialize())
    meta = {
        "input_spec": _spec_of(example_data),
        "output_keys": sorted(exp.out_tree.unflatten(
            [None] * exp.out_tree.num_leaves
        ).keys()),
        "platforms": list(platforms),
        "calling_convention_version": exp.calling_convention_version,
        "nr_devices": exp.nr_devices,
        "data_axis": data_axis if mesh is not None else None,
        "quantize": quantize,
        "conf": dict(conf) if conf is not None else None,
    }
    (out_dir / META).write_text(json.dumps(meta, indent=2, default=str))
    return meta


class ServingModel:
    """A loaded bundle: `pred = serving(data)`. No model code required.

    Sharded bundles (meta nr_devices > 1) need a `mesh` of the same device
    count; inputs are committed to the recorded batch sharding before the
    call (XLA refuses mismatched layouts instead of silently gathering)."""

    def __init__(self, bundle_dir, mesh=None):
        from jax import export

        bundle_dir = Path(bundle_dir)
        self.exported = export.deserialize(
            (bundle_dir / ARTIFACT).read_bytes()
        )
        self.meta = json.loads((bundle_dir / META).read_text())
        self.mesh = mesh
        n = self.meta.get("nr_devices", 1)
        if n > 1:
            if mesh is None or mesh.size != n:
                raise ValueError(
                    f"bundle was exported for {n} devices; pass a mesh of "
                    f"that size (got {getattr(mesh, 'size', None)})"
                )
            self._sharding = _batch_sharding(mesh, self.meta["data_axis"])
        else:
            self._sharding = None

    def __call__(self, data):
        import jax

        if self._sharding is not None:
            data = jax.tree.map(
                lambda a: jax.device_put(a, self._sharding), data
            )
        return self.exported.call(data)


def load_bundle(bundle_dir, mesh=None) -> ServingModel:
    return ServingModel(bundle_dir, mesh=mesh)


def save_bucketed(out_dir, model, variables, make_example, batch_sizes,
                  **kw):
    """Export one bundle per batch bucket (TPU serving wants one compiled
    program per static shape, not shape polymorphism): `make_example(b)`
    builds the example pytree for batch b. Returns the bucket list."""
    out_dir = Path(out_dir)
    sizes = sorted(set(int(b) for b in batch_sizes))
    for b in sizes:
        save_bundle(out_dir / f"b{b}", model, variables, make_example(b),
                    **kw)
    (out_dir / "buckets.json").write_text(json.dumps({"batch_sizes": sizes}))
    return sizes


class BucketedServing:
    """Dispatches a request to the smallest bucket that fits, zero-padding
    the batch dimension and slicing the outputs back. Requests larger than
    the biggest bucket are rejected (split upstream — silent chunking
    would hide a latency cliff)."""

    def __init__(self, bundle_dir, mesh=None):
        bundle_dir = Path(bundle_dir)
        sizes = json.loads((bundle_dir / "buckets.json").read_text())[
            "batch_sizes"
        ]
        self.sizes = sizes
        self.models = {
            b: ServingModel(bundle_dir / f"b{b}", mesh=mesh) for b in sizes
        }

    def __call__(self, data):
        import jax
        import jax.numpy as jnp

        leaves = jax.tree.leaves(data)
        n = int(leaves[0].shape[0])
        fits = [b for b in self.sizes if b >= n]
        if not fits:
            raise ValueError(
                f"batch {n} exceeds the largest serving bucket "
                f"{self.sizes[-1]}; split the request upstream"
            )
        b = fits[0]
        if b != n:
            data = jax.tree.map(
                lambda a: jnp.concatenate(
                    [a, jnp.zeros((b - n,) + a.shape[1:], a.dtype)], 0
                ),
                data,
            )
        out = self.models[b](data)
        if b != n:
            out = jax.tree.map(lambda a: a[:n], out)
        return out
