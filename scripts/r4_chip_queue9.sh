#!/bin/bash
# Round-4 chip queue 9: complete the 4x-scale mode set — two_stage and
# linear_probe at 4608 train clips, same recipe/checkpoint as queue 7, so
# the at-scale table has all four reference finetune modes.
# Launch: setsid bash scripts/r4_chip_queue9.sh > results/r4_queue9.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
while [ ! -f results/QUEUE8_DONE ]; do sleep 60; done

if [ ! -f results/separations_big2_r4/campaign_summary.json ]; then
  timeout 14400 python scripts/ssl_transfer_campaign.py \
      --out results/separations_big2_r4 \
      --data /tmp/ssl_campaign/data_app10_big --appearance 1.0 --clips 240 \
      --skip_ssl --skip_privacy \
      --ssl_ckpt results/separations_r4/ssl/ssl_epoch_60 \
      --ft_epochs 40 --modes "two_stage,linear_probe" \
      > results/separations_big2_r4.log 2>&1
fi
touch results/QUEUE9_DONE
