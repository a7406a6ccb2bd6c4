#!/bin/bash
# Round-4 chip queue, part 4: the missing CONTROL for the appearance-fixture
# transfer sweep. Every committed 5%/10%-label cell sits within ~2 sigma of
# chance (1/24), so the sweep can't distinguish "SSL features carry no
# signal" from "the low-label finetunes are label-starved". Full-label runs
# decide it:
#   - ft_random @ 100% labels  -> is the appearance task learnable at all
#     by this backbone/budget (the ceiling)?
#   - linear_probe @ 100% labels -> do the FROZEN SSL features linearly
#     decode the class (the decisive instrument the r3 verdict asked for)?
#   - ft_ssl @ 100% labels -> does SSL init help/hurt when labels are ample?
# Both checkpoint families, reusing the already-pretrained app-fixture
# checkpoints from results/sweep_r4_app/{ssl_a,mae_b}.
#
# Launch: setsid bash scripts/r4_chip_queue4.sh > results/r4_queue4.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

while [ ! -f results/QUEUE3_DONE ]; do sleep 60; done

DATA=/tmp/ssl_campaign/data_app
APP=0.6
OUT=results/sweep_r4_app
MODES="ft_random,ft_ssl,linear_probe"

if [ ! -f "$OUT/A_lab100/campaign_summary.json" ]; then
  timeout 14400 python scripts/ssl_transfer_campaign.py \
    --out "$OUT/A_lab100" --data "$DATA" --appearance "$APP" \
    --skip_ssl --skip_privacy \
    --ssl_ckpt "$OUT/ssl_a/ssl/ssl_epoch_60" \
    --backbone mobilevit_s \
    --ft_label_fraction 1.0 --ft_epochs 30 --modes "$MODES" \
    >> results/app_lab100.log 2>&1
fi
if [ ! -f "$OUT/B_lab100/campaign_summary.json" ]; then
  timeout 14400 python scripts/ssl_transfer_campaign.py \
    --out "$OUT/B_lab100" --data "$DATA" --appearance "$APP" \
    --skip_ssl --skip_privacy \
    --ssl_ckpt "$OUT/mae_b/ckpt/ckpt_epoch_60" \
    --backbone tinyvit \
    --ft_label_fraction 1.0 --ft_epochs 30 --modes "$MODES" \
    >> results/app_lab100.log 2>&1
fi

timeout 600 env JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu \
  python scripts/make_sweep_artifacts.py \
    --root "$OUT" --name ssl_transfer_sweep_app \
    > results/app_artifacts2.log 2>&1 || true

touch results/QUEUE4_DONE
