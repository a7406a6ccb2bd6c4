#!/bin/bash
# Round-4 chip queue 11 — the reference-absolute attempt at EQUAL data scale.
#
# The at-scale table (queues 7/9) reached two_stage 0.6311 / ft_ssl 0.6233 at
# 4608 train clips — within 4 points of the reference's UCF101 two_stage best
# (0.6715, logs/finetune.log) on a fixture HALF UCF101-train's size, with the
# 936->4608 jump proving the ceiling is dataset size. This queue closes the
# scale gap: 8x fixture (24 classes x 480 clips = 9216 train / 2304 val —
# UCF101-train is ~9.5k) at the identical appearance=1.0 recipe, with the
# full reference protocol (SSL pretrains on the SAME corpus it finetunes on):
#   1. 60-ep pipeline-A SSL pretrain on the 8x train split (labels unused)
#   2. ft_random / ft_ssl / two_stage at 40 ep, full labels
#
# device_resident=true keeps the 5.5 GB train split fully HBM-resident:
# 'auto' would pick chunked rotation at this size, which under the axon
# tunnel leaks ~split-bytes of host RSS per epoch (BENCH.md round 4 — the
# staging pin is per-transferred-byte and unconditional); full residency
# pays the pin once (~7 GB host) and every batch is an on-device gather.
#
# Launch: setsid bash scripts/r4_chip_queue11.sh > results/r4_queue11.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p results

OUT=results/separations_xl_r4
DATA=/tmp/ssl_campaign/data_app10_xl
SSL_CKPT=$OUT/ssl/ssl_epoch_60

# 1. fixture + SSL pretrain on the 8x split (resume boundary: the checkpoint)
if [ ! -d "$SSL_CKPT" ]; then
  timeout 14400 python scripts/ssl_transfer_campaign.py \
      --out $OUT --data $DATA --appearance 1.0 --clips 480 \
      --ssl_epochs 60 --skip_privacy --device_resident true \
      --modes "" \
      > results/separations_xl_ssl_r4.log 2>&1
fi

# 2. finetune modes, one campaign invocation each (per-mode resume guard)
for mode in ft_random ft_ssl two_stage; do
  if [ ! -f "$OUT/m_$mode/campaign_summary.json" ]; then
    timeout 14400 python scripts/ssl_transfer_campaign.py \
        --out "$OUT/m_$mode" --data $DATA --appearance 1.0 --clips 480 \
        --skip_ssl --skip_privacy --device_resident true \
        --ssl_ckpt "$SSL_CKPT" \
        --ft_epochs 40 --modes "$mode" \
        > "results/separations_xl_${mode}_r4.log" 2>&1
  fi
done

touch results/QUEUE11_DONE
