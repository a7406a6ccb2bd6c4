#!/bin/bash
# Round-4 chip queue 5 — runs after queue 4 drains.
#
# A. Reference-class accuracy separations (VERDICT r3 "missing #1", fixture
#    side): the committed full-label accuracies are all <= 0.22 because the
#    evidence fixtures are deliberately hard (motion-coded classes,
#    appearance randomized). This run asks whether the FRAMEWORK (not the
#    fixture) can produce reference-class numbers: appearance_signal=1.0
#    (class fully color-coded, the analog of UCF101's strong appearance
#    prior) with everything else production-shaped (24 classes, 936 train
#    clips, T=16, 112x112), all four reference finetune modes at full
#    labels from a 60-ep pipeline-A SSL checkpoint. Reference ordering to
#    compare against (src/plotting.py:81-99): ft_random 0.8063 >
#    two_stage 0.6715 > ft_ssl 0.6397 >> linear_probe 0.1348.
#
# B. MoE decoder on the real chip: 2-step smoke + steady-state throughput
#    A/B vs the dense decoder (single chip => vmap expert path; the EP
#    shard_map path is exercised by dryrun/tests on 8 virtual devices).
#
# Launch: setsid bash scripts/r4_chip_queue5.sh > results/r4_queue5.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

while [ ! -f results/QUEUE4_DONE ]; do sleep 60; done

# ---- A. separations campaign -----------------------------------------------
if [ ! -f results/separations_r4/campaign_summary.json ]; then
  timeout 14400 python scripts/ssl_transfer_campaign.py \
      --out results/separations_r4 \
      --data /tmp/ssl_campaign/data_app10 --appearance 1.0 \
      --ssl_epochs 60 --ft_epochs 40 --skip_privacy \
      --modes "ft_random,two_stage,ft_ssl,linear_probe" \
      > results/separations_r4.log 2>&1
fi

# ---- B. MoE decoder chip A/B ------------------------------------------------
[ -s results/probe_moe_chip.log ] || \
  timeout 2400 python scripts/probe_moe_chip.py > results/probe_moe_chip.log 2>&1

touch results/QUEUE5_DONE
