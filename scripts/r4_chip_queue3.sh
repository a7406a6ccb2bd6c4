#!/bin/bash
# Round-4 chip queue, part 3: re-run the raw-pixel MAE evidence with the
# LIVE encoder (the committed rawpix artifacts were produced with the dead
# TinyViT encoder — docs/ROUND4_NOTES.md §0 — so its "doesn't copy per-clip
# background color" conclusion needs re-testing). Chained after queue2.
#
# Launch: setsid bash scripts/r4_chip_queue3.sh > results/r4_queue3.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

while [ ! -f results/QUEUE2_DONE ]; do sleep 60; done

if [ ! -f results/mae_rawpix_r4/mae_pretrain_metrics.csv ]; then
  timeout 7200 python scripts/mae_evidence.py \
    --out results/mae_rawpix_r4 --data /tmp/mae_lown/data --nuisance 0.2 \
    --raw_pixel --epochs 60 --log_interval 5 \
    > results/mae_rawpix_r4.log 2>&1
fi
[ -f results/mae_rawpix_r4/mae_pretrain_steps.csv ] && \
  cp results/mae_rawpix_r4/mae_pretrain_steps.csv \
     docs/examples/csv/mae_pretrain_rawpix_steps.csv

touch results/QUEUE3_DONE
