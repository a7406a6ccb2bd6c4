#!/bin/bash
# Round-4 chip queue 14 — XL campaign recovery after a host reset.
#
# A VM reset wiped results/ and /tmp mid-queue-13: the XL fixture, the
# pipeline-A SSL checkpoint, and the in-flight B-family runs are gone.
# The committed artifacts (ssl_metrics_xl.csv, separations_xl_ft_random)
# came from the SAME deterministic fixture (data_seed=0) and seeded
# training, so regenerating the corpus keeps every new run comparable
# with them. This queue replays the lost chain in value order:
#   1. fixture regen + pipeline-A SSL pretrain (60 ep, 9216 clips)
#   2. ft_ssl / two_stage finetunes at 40 ep full labels
#      (ft_random 0.7218 best is already committed)
#   3. queue-12 payload: dynamic frontier + evaluate from the two_stage best
#   4. queue-13 payload: flagship pipeline-B pretrain + TinyViT modes
# Every step is resume-guarded on its primary output.
#
# Launch: setsid bash scripts/r4_chip_queue14.sh > results/r4_queue14.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p results

OUT=results/separations_xl_r4
DATA=/tmp/ssl_campaign/data_app10_xl
SSL_CKPT=$OUT/ssl/ssl_epoch_60

# 1. fixture + SSL pretrain on the 8x split (resume boundary: the checkpoint)
if [ ! -d "$SSL_CKPT" ]; then
  timeout 14400 python scripts/ssl_transfer_campaign.py \
      --out $OUT --data $DATA --appearance 1.0 --clips 480 \
      --ssl_epochs 60 --skip_privacy --device_resident true \
      --modes "" \
      > results/separations_xl_ssl_r4.log 2>&1
fi
[ -d "$SSL_CKPT" ] && touch results/XL_SSL_DONE

# 2. the two missing finetune modes
for mode in ft_ssl two_stage; do
  if [ ! -f "$OUT/m_$mode/campaign_summary.json" ]; then
    timeout 14400 python scripts/ssl_transfer_campaign.py \
        --out "$OUT/m_$mode" --data $DATA --appearance 1.0 --clips 480 \
        --skip_ssl --skip_privacy --device_resident true \
        --ssl_ckpt "$SSL_CKPT" \
        --ft_epochs 40 --modes "$mode" \
        > "results/separations_xl_${mode}_r4.log" 2>&1
  fi
  [ -f "$OUT/m_$mode/campaign_summary.json" ] && touch "results/XL_${mode}_DONE"
done

# 3. dynamic frontier + evaluate from the XL two_stage best (queue-12 payload)
TS_CKPT=$OUT/m_two_stage/finetune/two_stage/best
COMMON=(--set dataset.name=synthetic_app10_xl
  --set dataset.num_classes=24 --set dataset.backend=packed
  --set dataset.clip_len=16 --set dataset.stride=1 --set dataset.image_size=112
  --set model.embed_dim=256)

if [ -d "$TS_CKPT" ]; then
  for mode in early_exit frame_gating hybrid; do
    if [ ! -f "results/dynamic_xl_r4/${mode}_results.csv" ]; then
      timeout 7200 python -m ssl_vit_video_analytics_tpu.entry.run_dynamic \
        --config configs/dynamic.yaml --mode "$mode" "${COMMON[@]}" \
        --set "dataset.split=$DATA/splits/val.txt" \
        --set "model.finetune_ckpt=$TS_CKPT" \
        --set "output.save_dir=results/dynamic_xl_r4" \
        >> results/dynamic_xl_r4.log 2>&1
    fi
  done
  if [ ! -f results/evaluate_xl_r4/evaluate.csv ]; then
    timeout 3600 python -m ssl_vit_video_analytics_tpu.entry.evaluate \
      --config configs/finetune.yaml "${COMMON[@]}" \
      --ckpt "$TS_CKPT" --split "$DATA/splits/val.txt" \
      --set paths.result_dir=results/evaluate_xl_r4 \
      >> results/evaluate_xl_r4.log 2>&1
  fi
fi
[ -f results/dynamic_xl_r4/hybrid_results.csv ] && touch results/XL_DYNAMIC_DONE

# 4. flagship pipeline-B at XL (queue-13 payload)
B_OUT=results/mae_xl_r4
B_CKPT=$B_OUT/ckpt/ckpt_epoch_60
if [ ! -d "$B_CKPT" ]; then
  timeout 14400 python scripts/mae_evidence.py \
      --out $B_OUT --data $DATA --appearance 1.0 --clips 480 \
      --epochs 60 --log_interval 20 --device_resident true \
      > results/mae_xl_r4.log 2>&1
fi
[ -d "$B_CKPT" ] && touch results/XL_B_PRETRAIN_DONE

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

[ -f results/separations_xl_b_r4/m_two_stage/campaign_summary.json ] && \
  touch results/QUEUE14_DONE
exit 0
