#!/bin/bash
# Round-4 follow-up chip queue: runs after scripts/r4_chip_queue.sh drains
# (waits on results/QUEUE_DONE so the chip + 1-core host stay serialized).
#
# Contents: the d=128 decoder-repack probe (first pass died on a stale
# fixture path — fixed to the mae_evidence default /tmp/ssl_campaign/data).
#
# Launch: setsid bash scripts/r4_chip_queue2.sh > results/r4_queue2.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

while [ ! -f results/QUEUE_DONE ]; do sleep 60; done

[ -s results/probe_decoder_repack2.log ] || \
  timeout 2400 python scripts/probe_decoder_repack.py \
    > results/probe_decoder_repack2.log 2>&1

touch results/QUEUE2_DONE
