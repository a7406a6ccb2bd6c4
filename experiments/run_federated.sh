#!/bin/bash
# Federated FedAvg over the mesh client axis
set -e
echo "[INFO] Running federated learning"
python -m ssl_vit_video_analytics_tpu.entry.run_federated --config configs/federated.yaml "$@"
echo "[INFO] Federated run finished"
