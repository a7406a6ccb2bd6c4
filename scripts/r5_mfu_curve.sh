#!/bin/bash
# Round-5: MFU/throughput curve over batch x remat (VERDICT r4 ask #3).
# The step is HBM-bound (118.5 GB/step at B=16, BENCH.md round 4); remat
# trades HBM round-trips for recompute FLOPs and larger batch amortizes
# weight traffic — the two untested levers. One bench point per config,
# serving probe skipped (it is config-independent).
set -x
cd "$(dirname "$0")/.."
mkdir -p results
OUT=results/mfu_curve_r5.jsonl
: > "$OUT"
for B in 16 32 64; do
  for REMAT in none all; do
    echo "{\"config\": {\"batch\": $B, \"remat\": \"$REMAT\"}}" >> "$OUT"
    BENCH_BATCH=$B BENCH_REMAT=$REMAT BENCH_SKIP_SERVING=1 \
      timeout 1200 python bench.py >> "$OUT" 2>results/mfu_curve_${B}_${REMAT}.err \
      || echo "{\"error\": \"batch=$B remat=$REMAT failed (see .err)\"}" >> "$OUT"
  done
done
touch results/R5_MFU_CURVE_DONE
cat "$OUT"
