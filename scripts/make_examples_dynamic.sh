#!/bin/bash
# Regenerate the dynamic-inference example CSVs on the real chip.
#
# Produces docs/examples/csv/{early_exit,frame_gating,hybrid}_results.csv
# with the reference-exact headers (run_dynamic.py) and HONEST latency:
# every mode pre-warms its compiled fn before the timed loop.
#
# A short on-chip finetune first produces the checkpoint the dynamic modes
# evaluate (random weights would make the accuracy columns meaningless).
# NOTE: finetune reads paths.save_dir (reference config schema); the run_*
# entries read output.save_dir.
set -e
ROOT=${1:-/tmp/examples}
DATA=$ROOT/data
mkdir -p "$ROOT"

python - << EOF
from ssl_vit_video_analytics_tpu.data import make_synthetic_dataset
make_synthetic_dataset("$DATA", num_classes=8, videos_per_class=8,
                       num_frames=40, image_size=112, seed=0)
EOF

COMMON="--set dataset.num_classes=8 \
  --set dataset.train_split=$DATA/splits/train.txt \
  --set dataset.val_split=$DATA/splits/val.txt \
  --set dataset.split=$DATA/splits/val.txt \
  --set dataset.clip_len=16"

python -m ssl_vit_video_analytics_tpu.entry.train_finetune \
  --config configs/finetune.yaml --mode ft_random $COMMON \
  --set training.epochs=6 --set training.batch_size=8 \
  --set paths.save_dir=$ROOT/finetune

BEST=$ROOT/finetune/ft_random/best
test -e "$BEST" || { echo "NO CHECKPOINT at $BEST"; exit 1; }
for MODE in early_exit frame_gating hybrid; do
  python -m ssl_vit_video_analytics_tpu.entry.run_dynamic \
    --config configs/dynamic.yaml --mode $MODE $COMMON \
    --set model.finetune_ckpt=$BEST \
    --set runtime.batch_size=8 --set runtime.num_warmup=2 \
    --set output.save_dir=$ROOT/dynamic
done

cp $ROOT/dynamic/early_exit_results.csv \
   $ROOT/dynamic/frame_gating_results.csv \
   $ROOT/dynamic/hybrid_results.csv docs/examples/csv/
ls -la $ROOT/dynamic/
