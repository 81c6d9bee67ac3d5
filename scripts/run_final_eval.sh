#!/bin/bash
# End-of-round accuracy harvest (VERDICT r4 items 1 + 5). Run with the
# trainer STOPPED (the eval competes for the chip):
#
#   bash scripts/run_final_eval.sh [exp] [tag]
#
# Produces, at the repo root:
#   ACCURACY_r05.json — endopatches1800 two-loop eval of the trained
#                       checkpoint (H-AUC@1/3/5px, mprec, mnum_matches),
#                       the reference-HPatches-style detail block
#   VARIANTS_r05.json — f32 / int8 / adaptive accuracy table
set -e
exp=${1:-lg_synth_r5}
tag=${2:-r5}

echo "=== endopatches1800 eval ($exp -> $tag) ===" >&2
timeout 3000 python -m gluefactory_tpu.eval.endopatches1800 \
    --checkpoint "$exp" --tag "$tag" --overwrite eval.ransac_th=-1

python - "$exp" "$tag" <<'EOF'
import json, sys
from pathlib import Path

exp, tag = sys.argv[1], sys.argv[2]
summ = json.loads(
    Path(f"outputs/results/endopatches1800/{tag}/summaries.json").read_text())
out = {
    "benchmark": "endopatches1800",
    "experiment": exp,
    "protocol": "two-loop eval, device LO-RANSAC, ransac_th=-1 "
                "(best of 0.5..3.0), 1800 synthetic endo-homography pairs",
    "summaries": summ,
}
Path("ACCURACY_r05.json").write_text(json.dumps(out, indent=1))
print(json.dumps({k: v for k, v in summ.items()
                  if "H_error" in k or k.startswith("mnum") or "prec" in k}))
EOF

echo "=== variant accuracy deltas ===" >&2
timeout 3000 python scripts/quantify_variants.py "$exp" 4 > VARIANTS_r05.json
cat VARIANTS_r05.json

echo "=== adaptive-depth speed A/B (trained ckpt, structured pairs) ===" >&2
timeout 2400 python scripts/bench_adaptive.py "$exp" > ADAPTIVE_r05.json || true
cat ADAPTIVE_r05.json 2>/dev/null || true
