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


def export_apply(model, variables, example_data, platforms=("cpu", "tpu")):
    """Export `model.apply(variables, data, train=False)` with the variables
    baked in as constants. Returns the `jax.export.Exported` object."""
    import jax
    from jax import export

    def serve(data):
        return model.apply(variables, data, train=False)

    spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), example_data
    )
    return export.export(jax.jit(serve), platforms=list(platforms))(spec)


def save_bundle(out_dir, model, variables, example_data,
                platforms=("cpu", "tpu"), conf=None):
    """Export + write a serving bundle directory. Returns the meta dict."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    exp = export_apply(model, variables, example_data, platforms)
    (out_dir / ARTIFACT).write_bytes(exp.serialize())
    meta = {
        "input_spec": _spec_of(example_data),
        "output_keys": sorted(exp.out_tree.unflatten(
            [None] * exp.out_tree.num_leaves
        ).keys()),
        "platforms": list(platforms),
        "calling_convention_version": exp.calling_convention_version,
        "conf": dict(conf) if conf is not None else None,
    }
    (out_dir / META).write_text(json.dumps(meta, indent=2, default=str))
    return meta


class ServingModel:
    """A loaded bundle: `pred = serving(data)`. No model code required."""

    def __init__(self, bundle_dir):
        from jax import export

        bundle_dir = Path(bundle_dir)
        self.exported = export.deserialize(
            (bundle_dir / ARTIFACT).read_bytes()
        )
        self.meta = json.loads((bundle_dir / META).read_text())

    def __call__(self, data):
        return self.exported.call(data)


def load_bundle(bundle_dir) -> ServingModel:
    return ServingModel(bundle_dir)
