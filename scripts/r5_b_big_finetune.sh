#!/bin/bash
# Round-5: flagship pipeline-B transfer at ample finetune data (VERDICT r4
# ask #5), sized to fit the end-of-round window.
#
# The full queue-14 step-4 payload (B pretrain at XL, 60 ep ~= 4 chip-hours)
# does not fit the remaining wall clock, so this measures the core question
# — "does the MAE flagship transfer when labeled data is ample?" — with the
# honest compromise spelled out: the encoder is the FULLY-trained (60 ep)
# pipeline-B checkpoint from the seed-sweep stage-0 regen (936-clip
# appearance-0.6 corpus, scripts/r5_seed_sweep.sh), finetuned on the
# 4608-train-clip appearance-1.0 fixture where the committed A-family
# numbers live (two_stage 0.6311 / ft_random 0.5590, queue 7/8). Caveats to
# carry into docs: (a) B pretrain corpus is 936 clips at appearance 0.6 vs
# the A-family's matched 4608 @ 1.0 — B is handicapped, so a win is strong
# evidence and a loss is not conclusive; (b) ft_random with the tinyvit
# backbone is the matched control arm, run second.
#
# Launch: setsid bash scripts/r5_b_big_finetune.sh > results/r5_b_big.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p results

DATA=/tmp/ssl_campaign/data_app10_big
B_CKPT=results/sweep_r5_app/mae_b/ckpt/ckpt_epoch_60
[ -d "$B_CKPT" ] || { echo "no B ckpt at $B_CKPT"; exit 1; }

# ft_ssl first (the evidence cell), ft_random control second if time allows
for mode in ft_ssl ft_random; do
  if [ ! -f "results/b_big_r5/m_$mode/campaign_summary.json" ]; then
    timeout 4500 python scripts/ssl_transfer_campaign.py \
      --out "results/b_big_r5/m_$mode" --data "$DATA" \
      --appearance 1.0 --clips 240 \
      --skip_ssl --skip_privacy --device_resident true \
      --ssl_ckpt "$B_CKPT" --backbone tinyvit \
      --ft_epochs 30 --modes "$mode" \
      >> results/r5_b_big_cells.log 2>&1
  fi
done
[ -f results/b_big_r5/m_ft_ssl/campaign_summary.json ] && \
  touch results/R5_B_BIG_DONE
exit 0
