#!/bin/bash
# Round-4 chip queue 12 — frontier + evaluate at the XL (UCF101-train-scale)
# operating point.
#
# Queue 11 produces the 9216-train-clip campaign (the reference-absolute
# attempt at equal data scale). Once its two_stage finetune lands, re-trace
# the dynamic-inference frontier from that checkpoint — the reference's
# exact measurement protocol (its configs/dynamic.yaml points at the
# two_stage best) at the closest-to-reference operating point this
# environment can produce — and refresh evaluate.csv there too.
#
# Launch: setsid bash scripts/r4_chip_queue12.sh > results/r4_queue12.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

while [ ! -f results/QUEUE11_DONE ]; do sleep 60; done

DATA=/tmp/ssl_campaign/data_app10_xl
TS_CKPT=results/separations_xl_r4/m_two_stage/finetune/two_stage/best
COMMON=(--set dataset.name=synthetic_app10_xl
  --set dataset.num_classes=24 --set dataset.backend=packed
  --set dataset.clip_len=16 --set dataset.stride=1 --set dataset.image_size=112
  --set model.embed_dim=256)

# 1. dynamic frontier from the XL two_stage best
OUT=results/dynamic_xl_r4
if [ -d "$TS_CKPT" ]; then
  for mode in early_exit frame_gating hybrid; do
    if [ ! -f "$OUT/${mode}_results.csv" ]; then
      timeout 7200 python -m ssl_vit_video_analytics_tpu.entry.run_dynamic \
        --config configs/dynamic.yaml --mode "$mode" "${COMMON[@]}" \
        --set "dataset.split=$DATA/splits/val.txt" \
        --set "model.finetune_ckpt=$TS_CKPT" \
        --set "output.save_dir=$OUT" \
        >> results/dynamic_xl_r4.log 2>&1
    fi
  done

  # 2. evaluate.csv at the XL checkpoint (top-k + serving latency)
  if [ ! -f results/evaluate_xl_r4/evaluate.csv ]; then
    timeout 3600 python -m ssl_vit_video_analytics_tpu.entry.evaluate \
      --config configs/finetune.yaml "${COMMON[@]}" \
      --ckpt "$TS_CKPT" --split "$DATA/splits/val.txt" \
      --set paths.result_dir=results/evaluate_xl_r4 \
      >> results/evaluate_xl_r4.log 2>&1
  fi
fi

touch results/QUEUE12_DONE
