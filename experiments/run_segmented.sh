#!/bin/bash
# Segmented long-run wrapper for pipeline C (train_mae) — the axon-tunnel
# host-RSS mitigation for >HBM splits.
#
# Why: the axon tunnel client leaks host RSS per transferred byte on EVERY
# upload path, and explicitly deleting device buffers does not release the
# staging copy (measured: scripts/probe_ingest_rss.py, BENCH.md round 4).
# For splits larger than HBM, re-uploading shards each epoch is unavoidable,
# so the only hard bound on host RSS is process lifetime. This wrapper runs
# training as a chain of fresh processes, each covering
# `training.max_epochs_per_run` epochs; exact checkpoint-resume
# (tests/test_resume.py, tests/test_segmented.py) makes the chained result
# bit-identical to an uninterrupted run. On a real TPU host (no tunnel)
# there is no leak and this wrapper is unnecessary.
#
# Usage: bash experiments/run_segmented.sh <config.yaml> <out_dir> \
#            [epochs_per_segment=25] [extra --set overrides...]
set -euo pipefail
cd "$(dirname "$0")/.."

CFG="${1:?usage: run_segmented.sh <config.yaml> <out_dir> [epochs_per_seg]}"
OUT="${2:?usage: run_segmented.sh <config.yaml> <out_dir> [epochs_per_seg]}"
SEG="${3:-25}"
shift 2; [ $# -gt 0 ] && shift

EPOCHS=$(python - "$CFG" <<'EOF'
import sys, yaml
print(yaml.safe_load(open(sys.argv[1]))["training"]["epochs"])
EOF
)

for ((i = 0; i < (EPOCHS + SEG - 1) / SEG; i++)); do
  if [ -d "$OUT/ckpt_epoch_$EPOCHS" ]; then break; fi
  echo "=== segment $((i + 1)) (fresh process; resume from latest ckpt) ==="
  python -m ssl_vit_video_analytics_tpu.entry.train_mae --config "$CFG" \
    --set output.dir="$OUT" \
    --set training.max_epochs_per_run="$SEG" "$@"
done
[ -d "$OUT/ckpt_epoch_$EPOCHS" ] && echo "=== done: $OUT/ckpt_epoch_$EPOCHS ==="
