#!/bin/bash
# Round-4 chip queue 6: re-run the decoder-repack probe (its first two
# attempts died on a stale fixture path, then on the donated-state bug this
# queue's commit fixes), after queue 5 drains.
# Launch: setsid bash scripts/r4_chip_queue6.sh > results/r4_queue6.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
while [ ! -f results/QUEUE5_DONE ]; do sleep 60; done
timeout 2400 python scripts/probe_decoder_repack.py \
  > results/probe_decoder_repack3.log 2>&1
touch results/QUEUE6_DONE
