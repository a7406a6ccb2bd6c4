#!/bin/bash
# Round-4 chip work queue (serial — CLAUDE.md: host timings are poisoned by
# concurrent CPU work; run alone, one job at a time on the one real chip).
#
# v2 (post VM-restart): results/ was wiped, so every step regenerates its own
# inputs. The round-3 ft_random checkpoint the privacy grid used is gone —
# the privacy step now trains a fresh full-label ft_random (ft_random never
# reads an SSL checkpoint) before running the extended-sigma grid.
#
# Everything pipeline-B below is a RE-RUN: the TinyViT encoder was dead
# (unconditional zero-init BN scale on non-residual MBConv blocks, fixed in
# models/layers.py) for every previously committed B pretrain/finetune.
#
# Steps are guarded on their primary output so a tunnel drop + relaunch
# resumes instead of recomputing.
#
# Launch: setsid bash scripts/r4_chip_queue.sh > results/r4_queue.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p results

stamp() { echo "=== [$1] $(date -u +%H:%M:%S) ==="; }

# ---- 0. quick perf probes (VERDICT r3 #4) ---------------------------------
stamp probes
[ -s results/probe_cost_analysis.log ] || \
  timeout 1200 python scripts/probe_cost_analysis.py  > results/probe_cost_analysis.log 2>&1
[ -s results/probe_qkv_fusion.log ] || \
  timeout 1200 python scripts/probe_qkv_fusion.py     > results/probe_qkv_fusion.log 2>&1
[ -s results/probe_decoder_repack.log ] || \
  timeout 1200 python scripts/probe_decoder_repack.py > results/probe_decoder_repack.log 2>&1
[ -s results/probe_ingest_rss.log ] || \
  timeout 2400 python scripts/probe_ingest_rss.py     > results/probe_ingest_rss.log 2>&1

# ---- 1. pipeline-B 200-epoch pretrain, LIVE encoder + loss_mean (V #1/#6) --
stamp mae_b_200
B_CKPT=results/mae_evidence_200_r4/ckpt/ckpt_epoch_200
if [ ! -d "$B_CKPT" ]; then
  timeout 18000 python scripts/mae_evidence.py \
      --out results/mae_evidence_200_r4 --epochs 200 --log_interval 5 \
      > results/mae_b_200.log 2>&1
fi
[ -f results/mae_evidence_200_r4/mae_pretrain_metrics.csv ] && \
  cp results/mae_evidence_200_r4/mae_pretrain_metrics.csv \
     docs/examples/csv/mae_pretrain_200_metrics.csv

# ---- 2. appearance-fixture sweep: A+B pretrain + 10%/5% finetunes (V #1) --
stamp app_sweep
if [ ! -f results/sweep_r4_app/B_lab05/campaign_summary.json ]; then
  timeout 28800 bash experiments/run_transfer_sweep_app.sh > results/app_sweep_r4.log 2>&1
fi
timeout 600 env JAX_PLATFORM_NAME=cpu python scripts/make_sweep_artifacts.py \
    --root results/sweep_r4_app --name ssl_transfer_sweep_app \
    > results/app_artifacts.log 2>&1 || true

# ---- 3. motion-fixture B rows from the new 200-ep checkpoint (V #1) -------
stamp motion_sweep_B
for frac in 1.0 0.25 0.10 0.05; do
  tag=$(printf 'lab%s' "$(python -c "print(f'{round($frac*100):02d}' if $frac < 1 else '100')")")
  if [ ! -f "results/sweep_r4/B_${tag}/campaign_summary.json" ]; then
    timeout 7200 python scripts/ssl_transfer_campaign.py \
      --out "results/sweep_r4/B_${tag}" --skip_ssl --skip_privacy \
      --ssl_ckpt "$B_CKPT" --backbone tinyvit \
      --ft_label_fraction "$frac" --ft_epochs 30 \
      --modes "ft_random,ft_ssl,two_stage" \
      >> results/motion_sweep_B_r4.log 2>&1
  fi
done
# merge fresh B rows with the committed (still-valid) pipeline-A rows
timeout 600 env JAX_PLATFORM_NAME=cpu python scripts/make_sweep_artifacts.py \
    --root results/sweep_r4 --name ssl_transfer_sweep \
    --seed_csv docs/examples/csv/ssl_transfer_sweep.csv \
    > results/motion_artifacts.log 2>&1 || true

# ---- 4. feature-privacy extended-sigma grid (VERDICT r3 #2) ---------------
# Fresh full-label ft_random (never reads an SSL ckpt), then the grid with
# sigma extended to 4.0 and the per-dim embedding std logged for units.
stamp privacy
if [ ! -f results/ssl_transfer_v4/privacy/feature_privacy.csv ]; then
  timeout 10800 python scripts/ssl_transfer_campaign.py \
      --out results/ssl_transfer_v4 --skip_ssl --modes ft_random \
      > results/privacy_ext.log 2>&1
fi
[ -f results/ssl_transfer_v4/privacy/feature_privacy.csv ] && \
  cp results/ssl_transfer_v4/privacy/feature_privacy.csv docs/examples/csv/
# regenerate fig18/fig20 from the refreshed grid (CSV-driven pipeline)
timeout 600 env JAX_PLATFORM_NAME=cpu python -m ssl_vit_video_analytics_tpu.entry.plotting \
    --config configs/plotting.yaml \
    --set inputs.privacy_feature_csv=docs/examples/csv/feature_privacy.csv \
    --set inputs.dynamic_early_exit_csv=docs/examples/csv/early_exit_results.csv \
    --set inputs.dynamic_frame_gating_csv=docs/examples/csv/frame_gating_results.csv \
    --set inputs.privacy_visual_csv=docs/examples/csv/visual_privacy.csv \
    --set inputs.federated_csv=docs/examples/csv/fed_summary.csv \
    --set outputs.figures_dir=docs/examples/figures \
    --set outputs.summary_csv=docs/examples/csv/summary.csv \
    > results/replot_privacy.log 2>&1 || true

# ---- 5. pipeline-A at the reference 200-epoch horizon (VERDICT r3 #5) -----
stamp ssl_a_200
if [ ! -f results/ssl_a_200/ssl/ssl_metrics.csv ]; then
  timeout 14400 python scripts/ssl_transfer_campaign.py \
      --out results/ssl_a_200 --ssl_epochs 200 --modes "" --skip_privacy \
      > results/ssl_a_200.log 2>&1
fi
[ -f results/ssl_a_200/ssl/ssl_metrics.csv ] && \
  cp results/ssl_a_200/ssl/ssl_metrics.csv docs/examples/csv/ssl_metrics_200.csv

# ---- 6. final headline bench (driver also runs this at round end) ---------
stamp bench
timeout 3600 python bench.py > results/bench_r4.log 2>&1

stamp done
touch results/QUEUE_DONE
