#!/bin/bash
# Supervised finetune, 4-mode comparison
set -e
echo "[INFO] Running supervised fine-tuning (4-mode comparison)"
for MODE in ft_random linear_probe ft_ssl two_stage; do
  echo "[INFO] mode=$MODE"
  python -m ssl_vit_video_analytics_tpu.entry.train_finetune --config configs/finetune.yaml --mode "$MODE" "$@"
done
echo "[INFO] Finetuning finished"
