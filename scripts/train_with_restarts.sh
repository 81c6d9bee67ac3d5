#!/bin/bash
# Training with automatic process recycling (air-gapped TPU-tunnel machines:
# the axon client leaks every host->device transfer, so long runs must
# restart before the kernel OOM-killer hits — set train.max_host_rss_gb and
# the trainer checkpoints + exits 75 when crossed; this loop restores).
#
#   scripts/train_with_restarts.sh <exp> --conf <conf> \
#       train.max_host_rss_gb=100 [more overrides]
#
# MAX_RESTARTS (env, default 50) bounds the loop: a cap below the baseline
# process RSS would otherwise recycle forever without progress.
set -u
exp="$1"; shift
max=${MAX_RESTARTS:-50}
python -m gluefactory_tpu.train "$exp" "$@"
rc=$?
n=0
while [ $rc -eq 75 ] && [ $n -lt $max ]; do
  n=$((n + 1))
  echo "[train_with_restarts] RSS watchdog exit ($n/$max): restoring into a fresh process"
  python -m gluefactory_tpu.train "$exp" "$@" --restore
  rc=$?
done
exit $rc
