#!/bin/bash
# Round-4 chip queue 10 — federated learning at a reference-class operating
# point, plus the dynamic frontier from the two_stage best checkpoint.
#
# All committed fed_summary CSVs were measured on the hard (motion) fixture
# where every absolute sits at <= 0.12 top-1; the reference's federated
# evidence operates at top1 0.5992 (logs/federated.log round 10). Queue 7/9
# produced a 4608-clip fixture + checkpoints in the reference's accuracy
# regime (two_stage best 0.6311), so re-run the full run_federated protocol
# there: centralized same-budget baseline + cold FedAvg, then the
# reference's warm-start protocol (init from the finetuned best — ref
# src/run_federated.py:58-97 loads an init ckpt into the global model).
# Finally re-trace run_dynamic from the two_stage best: the reference's
# configs/dynamic.yaml points at its two_stage best checkpoint, so this is
# the exact reference measurement protocol (queue 8 used ft_random 0.559).
#
# Launch: setsid bash scripts/r4_chip_queue10.sh > results/r4_queue10.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

while [ ! -f results/QUEUE9_DONE ]; do sleep 60; done

DATA=/tmp/ssl_campaign/data_app10_big
TS_CKPT=results/separations_big2_r4/finetune/two_stage/best
COMMON=(--set dataset.name=synthetic_app10_big
  --set "dataset.train_split=$DATA/splits/train.txt"
  --set "dataset.val_split=$DATA/splits/val.txt"
  --set dataset.num_classes=24 --set dataset.backend=packed
  --set dataset.clip_len=16 --set dataset.stride=1 --set dataset.image_size=112
  --set model.embed_dim=256)

# 1. cold FedAvg + centralized same-budget baseline (skip the baseline on
#    re-entry if its CSV already exists — it is deterministic)
if [ ! -f results/fed_big_cold_r4/fed_summary.csv ]; then
  CENT=()
  [ -f results/fed_big_cold_r4/centralized_summary.csv ] && \
    CENT=(--set centralized.enabled=false)
  timeout 10800 python -m ssl_vit_video_analytics_tpu.entry.run_federated \
    --config configs/federated.yaml "${COMMON[@]}" "${CENT[@]}" \
    --set output.save_dir=results/fed_big_cold_r4 \
    --set paths.split_root=results/fed_big_cold_r4/splits \
    > results/fed_big_cold_r4.log 2>&1
fi

# 2. warm FedAvg from the two_stage best (reference warm-start protocol);
#    centralized baseline already measured above
if [ ! -f results/fed_big_warm_r4/fed_summary.csv ]; then
  timeout 10800 python -m ssl_vit_video_analytics_tpu.entry.run_federated \
    --config configs/federated.yaml "${COMMON[@]}" \
    --set "model.init_ckpt=$TS_CKPT" \
    --set centralized.enabled=false \
    --set output.save_dir=results/fed_big_warm_r4 \
    --set paths.split_root=results/fed_big_warm_r4/splits \
    > results/fed_big_warm_r4.log 2>&1
fi

# 3. dynamic frontier from the two_stage best (reference ckpt protocol)
OUT=results/dynamic_ts_r4
for mode in early_exit frame_gating hybrid; do
  if [ ! -f "$OUT/${mode}_results.csv" ]; then
    timeout 7200 python -m ssl_vit_video_analytics_tpu.entry.run_dynamic \
      --config configs/dynamic.yaml --mode "$mode" \
      --set dataset.name=synthetic_app10_big \
      --set "dataset.split=$DATA/splits/val.txt" \
      --set dataset.num_classes=24 \
      --set dataset.clip_len=16 --set dataset.stride=1 \
      --set dataset.image_size=112 \
      --set model.embed_dim=256 \
      --set "model.finetune_ckpt=$TS_CKPT" \
      --set "output.save_dir=$OUT" \
      >> results/dynamic_ts_r4.log 2>&1
  fi
done

touch results/QUEUE10_DONE
