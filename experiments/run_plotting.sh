#!/bin/bash
# CSV-driven paper figures
set -e
python -m ssl_vit_video_analytics_tpu.entry.plotting --config configs/plotting.yaml "$@"
