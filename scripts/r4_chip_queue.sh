#!/bin/bash
# Round-4 chip work queue (serial — CLAUDE.md: host timings are poisoned by
# concurrent CPU work; run alone, one job at a time on the one real chip).
#
# Everything pipeline-B below is a RE-RUN: the TinyViT encoder was dead
# (unconditional zero-init BN scale on non-residual MBConv blocks, fixed in
# models/layers.py) for every previously committed B pretrain/finetune.
#
# Launch: setsid bash scripts/r4_chip_queue.sh > results/r4_queue.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p results

stamp() { echo "=== [$1] $(date -u +%H:%M:%S) ==="; }

# ---- 0. quick perf probes (VERDICT r3 #4) ---------------------------------
stamp probes
timeout 1200 python scripts/probe_cost_analysis.py  > results/probe_cost_analysis.log 2>&1
timeout 1200 python scripts/probe_qkv_fusion.py     > results/probe_qkv_fusion.log 2>&1
timeout 1200 python scripts/probe_decoder_repack.py > results/probe_decoder_repack.log 2>&1
timeout 2400 python scripts/probe_ingest_rss.py     > results/probe_ingest_rss.log 2>&1

# ---- 1. feature-privacy extended-sigma grid (VERDICT r3 #2) ---------------
# Reuses the round-3 no-clip ft_random checkpoint; sigma list now extends to
# 4.0 (campaign priv_cfg). Rewrites results/ssl_transfer_v3_noclip/privacy/.
stamp privacy
timeout 5400 python scripts/ssl_transfer_campaign.py \
    --out results/ssl_transfer_v3_noclip --skip_ssl --modes "" \
    > results/privacy_ext.log 2>&1
cp results/ssl_transfer_v3_noclip/privacy/feature_privacy.csv docs/examples/csv/
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

# ---- 2. pipeline-A at the reference 200-epoch horizon (VERDICT r3 #5) -----
stamp ssl_a_200
timeout 14400 python scripts/ssl_transfer_campaign.py \
    --out results/ssl_a_200 --ssl_epochs 200 --modes "" --skip_privacy \
    > results/ssl_a_200.log 2>&1
cp results/ssl_a_200/ssl/ssl_metrics.csv docs/examples/csv/ssl_metrics_200.csv

# ---- 3. pipeline-B 200-epoch pretrain, LIVE encoder + loss_mean (V #1/#6) --
stamp mae_b_200
timeout 14400 python scripts/mae_evidence.py \
    --out results/mae_evidence_200_r4 --epochs 200 --log_interval 5 \
    > results/mae_b_200.log 2>&1
cp results/mae_evidence_200_r4/mae_pretrain_metrics.csv \
   docs/examples/csv/mae_pretrain_200_metrics.csv

# ---- 4. appearance-fixture B rerun (pretrain + 10%/5% finetunes) ----------
stamp app_sweep_B
rm -rf results/sweep_r4_app/mae_b results/sweep_r4_app/B_lab05 results/sweep_r4_app/B_lab10
timeout 21600 bash experiments/run_transfer_sweep_app.sh > results/app_sweep_r4.log 2>&1
timeout 600 python scripts/make_sweep_artifacts.py --root results/sweep_r4_app \
    --name ssl_transfer_sweep_app > results/app_artifacts.log 2>&1

# ---- 5. motion-fixture B rows rerun from the new 200-ep checkpoint --------
stamp motion_sweep_B
B_CKPT=results/mae_evidence_200_r4/ckpt/ckpt_epoch_200
for frac in 0.25 0.10 0.05; do
  tag=$(printf 'lab%02d' "$(python -c "print(round($frac*100))")")
  rm -rf "results/sweep_r4/B_${tag}"
  timeout 5400 python scripts/ssl_transfer_campaign.py \
    --out "results/sweep_r4/B_${tag}" --skip_ssl --skip_privacy \
    --ssl_ckpt "$B_CKPT" --backbone tinyvit \
    --ft_label_fraction "$frac" --ft_epochs 30 \
    --modes "ft_random,ft_ssl,two_stage" \
    >> results/motion_sweep_B_r4.log 2>&1
done
# full-label B cell for the 1.0 column
rm -rf results/sweep_r4/B_lab100
timeout 5400 python scripts/ssl_transfer_campaign.py \
    --out results/sweep_r4/B_lab100 --skip_ssl --skip_privacy \
    --ssl_ckpt "$B_CKPT" --backbone tinyvit \
    --ft_label_fraction 1.0 --ft_epochs 30 \
    --modes "ft_random,ft_ssl,two_stage" \
    >> results/motion_sweep_B_r4.log 2>&1

# ---- 6. final headline bench (driver also runs this at round end) ---------
stamp bench
timeout 3600 python bench.py > results/bench_r4.log 2>&1

stamp done
