#!/bin/bash
# SSL pipeline B: pixel-space VideoMAE pretraining
set -e
echo "[INFO] Running VideoMAE pretraining (pipeline B)"
python -m ssl_vit_video_analytics_tpu.entry.train_ssl_mae --config configs/ssl_mae.yaml "$@"
echo "[INFO] VideoMAE pretraining finished"
