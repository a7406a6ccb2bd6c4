#!/bin/bash
# Round-5 master chip queue.
#
# queue-14 (in flight at round start) owns the chip through its XL two_stage
# + dynamic/evaluate steps — the single highest-value payload (VERDICT r4
# ask #1). Its step 4 (pipeline-B XL pretrain + 3 finetunes) is ~4.5 chip-
# hours; VERDICT ranks the cheap evidence fixes (serving variance, MFU
# curve, privacy repeats, seed error bars) above finishing the B block, so
# this master:
#   1. waits for queue-14's XL_DYNAMIC_DONE marker,
#   2. stops queue-14 before/early-in its B block (resume-guarded, no loss),
#   3. runs: serving repeats -> MFU curve -> privacy x3 -> seed sweep,
#   4. re-launches queue-14 inline, which skips done steps and resumes the
#      B-family payload for the remaining wall clock.
# The insurance watcher (scripts/insurance_watch.sh) commits artifacts as
# they land throughout.
#
# Launch: setsid bash scripts/r5_master_queue.sh > results/r5_master.log 2>&1 &
#         echo $! > /tmp/r5_master.pid
set -x
cd "$(dirname "$0")/.."
mkdir -p results

# 1. wait for queue-14's dynamic step (poll the marker; 30s cadence)
while [ ! -f results/XL_DYNAMIC_DONE ]; do sleep 30; done

# 2. stop queue-14 (it is about to start / just started the 4.5h B block;
# every step is resume-guarded so nothing is lost). GNU timeout runs each
# step in its OWN process group, so kill the queue bash's group first (no
# further steps launch) and then every child's group (the in-flight
# timeout+python) — killing only the bash would leave python training on
# the chip (CLAUDE.md).
if [ -f /tmp/queue14.pid ]; then
  QP=$(cat /tmp/queue14.pid)
  CHILDREN=$(cat "/proc/$QP/task/$QP/children" 2>/dev/null || true)
  kill -- -"$QP" 2>/dev/null || true
  for c in $CHILDREN; do
    pg=$(ps -o pgid= -p "$c" 2>/dev/null | tr -d ' ')
    [ -n "$pg" ] && kill -- -"$pg" 2>/dev/null || true
  done
  sleep 10
fi

# 3a. serving-latency variance (one session, N=5) — VERDICT weak #4
if [ ! -f results/serving_repeats_r5.json ]; then
  timeout 1800 python scripts/r5_serving_repeats.py 5 \
    > results/r5_serving.log 2>&1 || true
fi

# 3b. MFU/throughput curve over batch x remat — VERDICT ask #3
if [ ! -f results/R5_MFU_CURVE_DONE ]; then
  bash scripts/r5_mfu_curve.sh > results/r5_mfu.log 2>&1 || true
fi

# 3c. feature-privacy grid with attacker repeats — VERDICT ask #4
if [ ! -f results/privacy_r5/feature_privacy_repeats.csv ]; then
  timeout 3600 python scripts/r5_privacy_grid.py \
    > results/r5_privacy.log 2>&1 || true
fi

# 3d. low-label seed replicates — VERDICT ask #2
if [ ! -f results/R5_SEED_SWEEP_DONE ]; then
  bash scripts/r5_seed_sweep.sh > results/r5_seed_sweep.log 2>&1 || true
fi

# 4. resume queue-14's remaining payload (B pretrain + finetunes)
bash scripts/r4_chip_queue14.sh > results/r4_queue14_resume.log 2>&1 || true

touch results/R5_MASTER_DONE
