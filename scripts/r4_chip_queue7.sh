#!/bin/bash
# Round-4 chip queue 7 — the data-size hypothesis.
#
# Queue 5's appearance=1.0 full-label run and the motion fixture both cap
# val top-1 at ~0.22 while TRAIN top-1 hits 1.0 (loss ~0.02): the binding
# constraint at 936 train clips is generalization, not class signal or
# optimization. The reference's 0.8063 ft_random is trained on UCF101's
# ~9.5k clips. This queue scales the fixture 4x (24 classes x 240
# clips/class = 4608 train / 1152 val) at the same appearance=1.0 recipe:
# if val top-1 climbs substantially, the remaining accuracy gap to the
# reference's headline numbers is DATASET SIZE (env has no real dataset),
# not framework behavior.
#
# Launch: setsid bash scripts/r4_chip_queue7.sh > results/r4_queue7.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

while [ ! -f results/QUEUE6_DONE ]; do sleep 60; done

if [ ! -f results/separations_big_r4/campaign_summary.json ]; then
  timeout 14400 python scripts/ssl_transfer_campaign.py \
      --out results/separations_big_r4 \
      --data /tmp/ssl_campaign/data_app10_big --appearance 1.0 --clips 240 \
      --skip_ssl --skip_privacy \
      --ssl_ckpt results/separations_r4/ssl/ssl_epoch_60 \
      --ft_epochs 40 --modes "ft_random,ft_ssl" \
      > results/separations_big_r4.log 2>&1
fi

touch results/QUEUE7_DONE
