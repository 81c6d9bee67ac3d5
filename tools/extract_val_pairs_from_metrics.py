"""Select pairs from a per-pair metrics TSV into a pairs list.

Reference analog: `tools/extract_val_pairs_from_metrics.py` (regex over a
metrics txt). Our trainer writes structured per-pair TSV logs
(`train.log_metrics_path`, columns: step index name overlap <metrics...>),
so this tool filters/sorts those directly: pick the worst (or best) K pairs
by a metric at the latest step — the curated list feeds
`datasets/image_pairs.py` or a focused eval rerun.

Usage:
  python -m tools.extract_val_pairs_from_metrics metrics.tsv out_pairs.txt \\
      --metric match_recall --worst 50
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def load_tsv(path: Path):
    lines = path.read_text().strip().splitlines()
    header = lines[0].split("\t")
    rows = [dict(zip(header, ln.split("\t"))) for ln in lines[1:]]
    return header, rows


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("tsv", type=Path)
    ap.add_argument("out", type=Path)
    ap.add_argument("--metric", type=str, required=True)
    ap.add_argument("--worst", type=int, default=None,
                    help="keep the K lowest-metric pairs")
    ap.add_argument("--best", type=int, default=None,
                    help="keep the K highest-metric pairs")
    ap.add_argument("--step", type=int, default=None,
                    help="restrict to this step (default: latest in file)")
    args = ap.parse_args(argv)

    header, rows = load_tsv(args.tsv)
    if args.metric not in header:
        raise SystemExit(
            f"metric '{args.metric}' not in columns {header}")
    step = args.step if args.step is not None else max(
        int(r["step"]) for r in rows)
    rows = [r for r in rows if int(r["step"]) == step and r.get("name")]
    rows.sort(key=lambda r: float(r[args.metric]))
    if args.worst:
        rows = rows[: args.worst]
    elif args.best:
        rows = rows[-args.best:][::-1]
    args.out.write_text("".join(f"{r['name']}\n" for r in rows))
    print(f"step {step}: wrote {len(rows)} pairs -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
