#!/bin/bash
# SSL pipeline A: EMA teacher-student + VICReg + TOP pretraining
set -e
echo "[INFO] Running SSL pretraining (pipeline A)"
python -m ssl_vit_video_analytics_tpu.entry.train_ssl --config configs/ssl_train.yaml "$@"
echo "[INFO] SSL pretraining finished"
