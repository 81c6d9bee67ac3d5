"""Inspect HDF5 files produced by the framework (feature caches, eval
predictions/results) — structure, shapes, dtypes, and light statistics.

Reference analog: `tools/inspect_h5.py` (structure dump). This version adds
per-dataset min/max/mean for numeric arrays and a `--key` filter.

Usage:
  python -m tools.inspect_h5 <file.h5> [--samples] [--key keypoints0]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import h5py
import numpy as np


def describe(name: str, d: h5py.Dataset, samples: bool):
    line = f"  {name}: shape={d.shape} dtype={d.dtype}"
    if d.size and np.issubdtype(d.dtype, np.number):
        a = d[...]
        line += f" min={a.min():.4g} max={a.max():.4g} mean={a.mean():.4g}"
        if np.issubdtype(d.dtype, np.floating):
            nbad = int(np.size(a) - np.isfinite(a).sum())
            if nbad:
                line += f" NONFINITE={nbad}"
    print(line)
    if samples and d.size and d.size <= 16:
        print(f"    value: {d[...]}")


def inspect_file(path: Path, samples: bool = False, key: str | None = None):
    print(f"== {path} ({path.stat().st_size / 1e6:.2f} MB)")
    with h5py.File(path, "r") as f:
        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                if key is None or key in name:
                    describe(name, obj, samples)
            else:
                print(f"[{name}/]  ({len(obj)} children)")

        f.visititems(visit)
        if f.attrs:
            print("attrs:", dict(f.attrs))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("files", type=Path, nargs="+")
    ap.add_argument("--samples", action="store_true")
    ap.add_argument("--key", type=str, default=None)
    args = ap.parse_args(argv)
    for p in args.files:
        inspect_file(p, args.samples, args.key)
    return 0


if __name__ == "__main__":
    sys.exit(main())
