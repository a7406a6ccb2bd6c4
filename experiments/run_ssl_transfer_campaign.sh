#!/bin/bash
# SSL-transfer evidence campaign: pipeline-A pretrain -> ft_ssl vs ft_random
# vs linear_probe at equal budget -> feature-privacy grid, then figures.
# All campaign knobs pass through (e.g. --ft_augment --ft_lr 2e-4 --smoke).
set -e
echo "[INFO] Running SSL-transfer campaign"
python scripts/ssl_transfer_campaign.py "$@"
python scripts/make_campaign_artifacts.py
echo "[INFO] Campaign + artifacts finished"
