#!/bin/bash
# Round-4 chip queue 13 — the FLAGSHIP pipeline at the XL operating point.
#
# Queues 11/12 close the reference-absolute attempt with the pipeline-A
# (MobileViT) checkpoint family. The round-3 verdict's remaining structural
# weakness (#3) was "flagship pretraining feeds nothing downstream": that
# was closed qualitatively in the small-fixture sweeps (B rows of
# ssl_transfer_sweep*.csv), but the reference-class operating point —
# UCF101-train-scale corpus, full labels, reference protocol (pretrain on
# the same corpus the finetune sees) — has only been run for family A.
#
# This queue runs the full flagship story at XL:
#   1. pipeline-B TinyVideoMAE pretrain on the 9216-clip XL corpus
#      (60 epochs — the campaign SSL_EPOCHS protocol; tube mask 0.9,
#      norm-pix, bf16; fully HBM-resident split: the chunked auto path
#      leaks ~shard-bytes host RSS per rotation under the axon tunnel)
#   2. TinyViT-backbone finetunes at 40 ep full labels:
#      ft_random (control) / ft_ssl / two_stage from the B checkpoint
#
# Waits for queue 12 (the chip is serial — CLAUDE.md). Every step is
# resume-guarded on its primary output.
#
# Launch: setsid bash scripts/r4_chip_queue13.sh > results/r4_queue13.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p results

while [ ! -f results/QUEUE12_DONE ]; do sleep 60; done

DATA=/tmp/ssl_campaign/data_app10_xl
B_OUT=results/mae_xl_r4
B_CKPT=$B_OUT/ckpt/ckpt_epoch_60

# 1. flagship pipeline-B MAE pretrain on the XL corpus
if [ ! -d "$B_CKPT" ]; then
  timeout 14400 python scripts/mae_evidence.py \
      --out $B_OUT --data $DATA --appearance 1.0 --clips 480 \
      --epochs 60 --log_interval 20 --device_resident true \
      > results/mae_xl_r4.log 2>&1
fi

# 2. TinyViT-backbone finetune modes from the XL B checkpoint
for mode in ft_random ft_ssl two_stage; do
  if [ ! -f "results/separations_xl_b_r4/m_$mode/campaign_summary.json" ]; then
    timeout 14400 python scripts/ssl_transfer_campaign.py \
        --out "results/separations_xl_b_r4/m_$mode" --data $DATA \
        --appearance 1.0 --clips 480 \
        --skip_ssl --skip_privacy --device_resident true \
        --ssl_ckpt "$B_CKPT" --backbone tinyvit \
        --ft_epochs 40 --modes "$mode" \
        > "results/separations_xl_b_${mode}_r4.log" 2>&1
  fi
done

touch results/QUEUE13_DONE
