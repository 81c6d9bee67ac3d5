"""Convert official torch checkpoints into framework checkpoints
(reference `tools/convert_weights/`).

  python tools/convert_weights/convert_torch_checkpoint.py \
      --model superpoint|superpoint_open|lightglue|superglue \
      --input weights.pth --output outputs/training/<name> \
      [--n_layers 9]

The output directory becomes loadable with
`gluefactory_tpu.load_experiment("<name>")` / eval `--checkpoint`.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import numpy as np  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True,
                        choices=["superpoint", "superpoint_open", "lightglue", "superglue"])
    parser.add_argument("--input", type=Path, required=True)
    parser.add_argument("--output", type=Path, required=True)
    parser.add_argument("--n_layers", type=int, default=9)
    args = parser.parse_args()

    from gluefactory_tpu.core.config import Config
    from gluefactory_tpu.utils.experiments import save_experiment
    from gluefactory_tpu.utils.torch_weights import (
        convert_lightglue,
        convert_superglue,
        convert_superpoint,
        convert_superpoint_open,
        load_torch_state_dict,
    )

    sd = load_torch_state_dict(args.input)
    if args.model == "superpoint":
        variables = convert_superpoint(sd)
        model_conf = {"name": "superpoint", "channels": [64, 64, 128, 128, 256], "norm": "none"}
    elif args.model == "superpoint_open":
        variables = convert_superpoint_open(sd)
        model_conf = {"name": "superpoint", "channels": [64, 64, 128, 128, 256], "norm": "none"}
    elif args.model == "lightglue":
        variables = convert_lightglue(sd, n_layers=args.n_layers)
        model_conf = {"name": "lightglue", "n_layers": args.n_layers}
    else:
        variables = convert_superglue(sd, n_layers=args.n_layers)
        model_conf = {"name": "superglue", "n_layers": args.n_layers, "norm": "none"}

    args.output.mkdir(parents=True, exist_ok=True)
    conf = Config({"model": model_conf})
    save_experiment(
        args.output,
        {"params": variables, "step": np.asarray(0)},
        conf=conf,
        step=0,
        keep_last=0,
    )
    print(f"converted {args.model} -> {args.output}/checkpoint_0")


if __name__ == "__main__":
    main()
