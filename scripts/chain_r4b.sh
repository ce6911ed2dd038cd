#!/bin/bash
# Round-4 follow-on chain: waits for chain_r4 to release the chip, then
# runs the stages that depend on round-4 code fixes landed after
# chain_r4 started (CG precision fix, gather-friendly layout, window
# streaming). Same artifact-gated stage pattern.
cd /root/repo
exec >> results/chain_r4b.log 2>&1

DEADLINE=$(( $(date +%s) + 6*3600 ))
echo "=== chain_r4b start $(date) ==="
until grep -q "chain_r4 done" results/chain_r4.log 2>/dev/null; do
  [ "$(date +%s)" -gt "$DEADLINE" ] && { echo "deadline waiting"; exit 0; }
  sleep 60
done
echo "=== chain_r4 released the chip $(date) ==="

commit_results() {
  git add -A results/ 2>/dev/null
  git diff --cached --quiet || git commit -m "$1" 2>/dev/null
}

stage() {  # stage <name> <artifact> <timeout_s> <cmd...>
  local name=$1 art=$2 to=$3; shift 3
  [ "$(date +%s)" -gt "$DEADLINE" ] && { echo "deadline"; exit 0; }
  if [ -e "$art" ]; then echo "=== skip $name ($art present)"; return 0; fi
  echo "=== $name $(date) ==="
  timeout "$to" "$@"
  local rc=$?
  [ $rc -ne 0 ] && echo "--- $name exited rc=$rc"
  commit_results "Round-4 artifact: $name"
  return 0
}

# 1. train-step decomposition at the best batch (roofline table input)
stage probe_r4_train results/probe_r4_train.json 2700 \
  python scripts/probe_r4_train.py

# 2. train scaling re-run on the gather-friendly layout
stage train_scaling_b results/train_scaling_r4b.log 3600 \
  bash -c 'BENCH_TRAIN_VARIANTS=f32_rbg,bf16_rbg BENCH_TRAIN_BATCHES=1024,2048,4096 python bench.py --train > results/train_scaling_r4b.log 2>&1'

# 3. CG probes after the matmul-precision fix (accuracy + honest cost)
stage lmmse_cg_fixed results/probe_lmmse_cg_r4b.json 1800 \
  python scripts/probe_lmmse_cg_tpu.py -o results/probe_lmmse_cg_r4b.json
stage lmmse_cg_nt64_fixed results/probe_lmmse_cg_nt64b.json 1800 \
  python scripts/probe_lmmse_cg_tpu.py --num-tx 64 --num-rx 8 \
    -o results/probe_lmmse_cg_nt64b.json

# 4. host-streaming scale test, window mode (corpus never in host RAM)
stage hoststream results/hoststream_scale.json 5400 \
  bash -c 'python scripts/run_hoststream_tpu.py > results/hoststream.log 2>&1'

commit_results "Round-4 artifacts: chain_r4b final sweep"
echo "=== chain_r4b done $(date) ==="
