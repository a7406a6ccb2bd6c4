#!/bin/bash
# Privacy evaluation: visual + feature layers
set -e
echo "[INFO] Running privacy evaluation"
python -m ssl_vit_video_analytics_tpu.entry.run_privacy --config configs/privacy.yaml "$@"
echo "[INFO] Privacy evaluation finished"
