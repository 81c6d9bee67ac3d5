"""Convert COLMAP text maps to the framework's Endomapper npz format
(reference `tools/preprocess_endomapper.py`, 401 LoC offline tool).

  python tools/preprocess_endomapper.py --sparse_dir <colmap_txt_dir> \
      --output data/endomapper/maps/seqXX.npz [--max_kpts 2048]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from gluefactory_tpu.datasets.endomapper_utils import colmap_map_to_npz  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sparse_dir", type=Path, required=True)
    parser.add_argument("--output", type=Path, required=True)
    parser.add_argument("--max_kpts", type=int, default=None)
    args = parser.parse_args()
    args.output.parent.mkdir(parents=True, exist_ok=True)
    out = colmap_map_to_npz(args.sparse_dir, args.output, max_kpts=args.max_kpts)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
