"""Export a pipeline as a self-contained AOT serving bundle
(`gluefactory_tpu/utils/serving.py`: StableHLO artifact with weights baked
in — the TPU deployment path the reference lacks; its serving story is
"install gluefactory+torch and rebuild the model zoo per process").

    python tools/export_serving.py out/bundle --experiment my_exp \
        [--batch 8] [--width 640] [--height 480] [--platforms cpu,tpu]
    python tools/export_serving.py out/bundle --conf '{"name": "two_view_pipeline", ...}'

With --experiment the best checkpoint of a trained run is frozen; with
--conf (JSON or a YAML file path) the model is randomly initialized (useful
for shape/perf validation of a serving bucket before training finishes).
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def build_example(batch, height, width):
    import jax.numpy as jnp
    import numpy as np

    sz = jnp.broadcast_to(
        jnp.asarray([float(width), float(height)]), (batch, 2)
    )
    im = jnp.zeros((batch, height, width, 1), jnp.float32)
    del np
    return {
        "view0": {"image": im, "image_size": sz},
        "view1": {"image": im, "image_size": sz},
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("output", type=Path)
    p.add_argument("--experiment", type=str, default=None)
    p.add_argument("--conf", type=str, default=None)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--platforms", type=str, default="cpu,tpu")
    p.add_argument(
        "--quantize", type=str, default=None, choices=[None, "int8"],
        help="store large weights as per-channel int8 (~4x smaller artifact)",
    )
    args = p.parse_args()
    if (args.experiment is None) == (args.conf is None):
        p.error("exactly one of --experiment / --conf is required")

    import jax

    from gluefactory_tpu.core.config import Config
    from gluefactory_tpu.models import get_model
    from gluefactory_tpu.utils.serving import save_bundle

    data = build_example(args.batch, args.height, args.width)
    if args.experiment:
        from gluefactory_tpu.utils.experiments import load_experiment

        model, variables, conf = load_experiment(args.experiment)
        conf = conf.get("model", conf)
    else:
        conf = (
            Config.load(args.conf)
            if Path(args.conf).exists()
            else Config(json.loads(args.conf))
        )
        model = get_model(conf["name"]).from_conf(conf)
        variables = model.init(jax.random.PRNGKey(0), data, train=False)

    meta = save_bundle(
        args.output, model, variables, data,
        platforms=tuple(args.platforms.split(",")), conf=conf,
        quantize=args.quantize,
    )
    size = (args.output / "model.stablehlo").stat().st_size
    print(
        f"wrote {args.output} ({size / 1e6:.1f} MB, "
        f"platforms={meta['platforms']}, outputs={meta['output_keys']})"
    )


if __name__ == "__main__":
    main()
