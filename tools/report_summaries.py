"""Aggregate benchmark summaries across runs into one report
(reference `tools/report_summaries.py`).

  python tools/report_summaries.py [--benchmark hpatches] [--csv out.csv]
"""

import argparse
import json
from pathlib import Path

import sys

sys.path.insert(0, str(Path(__file__).parent.parent))

from gluefactory_tpu.settings import EVAL_PATH  # noqa: E402


def collect(benchmark=None):
    rows = []
    benchmarks = (
        [EVAL_PATH / benchmark] if benchmark else sorted(EVAL_PATH.iterdir())
    )
    for bdir in benchmarks:
        if not bdir.is_dir():
            continue
        for run in sorted(bdir.iterdir()):
            summ = run / "summaries.json"
            if not summ.exists():
                continue
            data = json.loads(summ.read_text())
            rows.append({"benchmark": bdir.name, "run": run.name, **data})
    return rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--benchmark", type=str, default=None)
    parser.add_argument("--csv", type=str, default=None)
    args = parser.parse_args()
    rows = collect(args.benchmark)
    if not rows:
        print("no summaries found under", EVAL_PATH)
        return
    keys = ["benchmark", "run"] + sorted(
        {k for r in rows for k in r} - {"benchmark", "run"}
    )
    if args.csv:
        import csv

        with open(args.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(rows)
        print("wrote", args.csv)
    else:
        for r in rows:
            print(f"== {r['benchmark']} / {r['run']} ==")
            for k in keys[2:]:
                if k in r:
                    print(f"  {k}: {r[k]}")


if __name__ == "__main__":
    main()
