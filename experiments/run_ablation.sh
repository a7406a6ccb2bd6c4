#!/bin/bash
# Ablation and sensitivity studies (override-based, no config rewriting)
set -e
echo "[INFO] Running ablation and sensitivity studies"
python -m ssl_vit_video_analytics_tpu.entry.ablations "$@"
echo "[INFO] Ablation experiments finished"
