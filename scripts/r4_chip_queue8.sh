#!/bin/bash
# Round-4 chip queue 8 — the dynamic-inference frontier at a reference-class
# operating point.
#
# All committed run_dynamic CSVs were traced from low-accuracy checkpoints
# (hard-fixture top1 <= 0.22), so the early-exit/gating frontiers operate
# nowhere near the reference's (logs/dynamic.log sits at top1 ~0.66). Queue 7
# produced a genuinely accurate checkpoint (4x appearance fixture, val top1
# 0.54+ and climbing at ep 13); re-trace all three dynamic modes from its
# best ft_random checkpoint so fig17's frontier is measured at a realistic
# accuracy, like the reference's.
#
# Launch: setsid bash scripts/r4_chip_queue8.sh > results/r4_queue8.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

while [ ! -f results/QUEUE7_DONE ]; do sleep 60; done

CKPT=results/separations_big_r4/finetune/ft_random/best
OUT=results/dynamic_big_r4
for mode in early_exit frame_gating hybrid; do
  if [ ! -f "$OUT/${mode}_results.csv" ]; then
    timeout 7200 python -m ssl_vit_video_analytics_tpu.entry.run_dynamic \
      --config configs/dynamic.yaml --mode "$mode" \
      --set dataset.name=synthetic_app10_big \
      --set dataset.split=/tmp/ssl_campaign/data_app10_big/splits/val.txt \
      --set dataset.num_classes=24 \
      --set dataset.clip_len=16 --set dataset.image_size=112 \
      --set model.embed_dim=256 \
      --set "model.finetune_ckpt=$CKPT" \
      --set "output.save_dir=$OUT" \
      >> results/dynamic_big_r4.log 2>&1
  fi
done

touch results/QUEUE8_DONE
