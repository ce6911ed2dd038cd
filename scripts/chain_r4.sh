#!/bin/bash
# Round-4 TPU job chain: one chip, strictly serial, each stage gated on
# its OWN artifact (round-specific files — the r3 supervisor's grep of a
# cumulative committed log could be satisfied by an older round and
# silently skip a failed stage; ADVICE r3) and committed as it lands.
cd /root/repo
exec >> results/chain_r4.log 2>&1

commit_results() {
  git add -A results/ 2>/dev/null
  git diff --cached --quiet || git commit -m "$1" 2>/dev/null
}

stage() {  # stage <name> <artifact> <timeout_s> <cmd...>
  local name=$1 art=$2 to=$3; shift 3
  if [ -e "$art" ]; then echo "=== skip $name ($art present)"; return 0; fi
  echo "=== $name $(date) ==="
  timeout "$to" "$@"
  local rc=$?
  [ $rc -ne 0 ] && echo "--- $name exited rc=$rc"
  commit_results "Round-4 artifact: $name"
  return 0
}

echo "=== chain_r4 start $(date) ==="

# 1. headline inference bench (also the real-chip verify leg)
stage bench_inference results/bench_r4.json 2400 \
  bash -c 'python bench.py > results/bench_r4.json.tmp 2> results/bench_r4.err && tail -1 results/bench_r4.json.tmp > results/bench_r4.json'

# 2. train bench, headline-compat rows (refresh the stale artifact)
stage train_bench results/train_bench_r4.log 3600 \
  bash -c 'BENCH_TRAIN_VARIANTS=f32,bf16,f32_rbg BENCH_TRAIN_BATCHES=256,1024 python bench.py --train > results/train_bench_r4.log 2>&1'

# 3. train bench, batch-scaling + bf16-moment push
stage train_scaling results/train_scaling_r4.log 3600 \
  bash -c 'BENCH_TRAIN_VARIANTS=f32_rbg,bf16_rbg,bf16_rbg_mubf16 BENCH_TRAIN_BATCHES=1024,2048,4096 python bench.py --train > results/train_scaling_r4.log 2>&1'

# 4. clean-window LMMSE-CG remeasure + Nt=64/Nr=8 row (+ accuracy bound)
stage lmmse_cg_clean results/probe_lmmse_cg_r4.json 1800 \
  python scripts/probe_lmmse_cg_tpu.py -o results/probe_lmmse_cg_r4.json
stage lmmse_cg_nt64 results/probe_lmmse_cg_nt64.json 1800 \
  python scripts/probe_lmmse_cg_tpu.py --num-tx 64 --num-rx 8 \
    -o results/probe_lmmse_cg_nt64.json

# 5. dataset-generation throughput (packets/s, three modes)
stage gen_bench results/gen_bench_r4.json 2400 \
  bash -c 'python bench.py --gen > results/gen_bench_r4.json.tmp 2> results/gen_bench_r4.err && tail -1 results/gen_bench_r4.json.tmp > results/gen_bench_r4.json'

# 6. NoiseFigure receiver branch measured artifact
stage nf_sweep results/nf_sweep.json 2400 python scripts/run_nf_tpu.py

# 7. training parity gates (f32/bf16 cached from r3; rbg + mubf16 new)
stage train_parity results/train_parity_r4.done 7200 \
  bash -c 'python scripts/run_train_parity_tpu.py && touch results/train_parity_r4.done'

# 8. DNN under interference (trains 2 models + 4-level sweep)
stage sinr_dnn results/sinr_dnn_r4.done 9000 \
  bash -c 'python scripts/run_sinr_dnn_tpu.py > results/sinr_dnn.log 2>&1 && touch results/sinr_dnn_r4.done'

# 9. MU sweep at the protocol grid (models cached in runs/mu_dnn)
stage mu_grid results/mu_grid_r4.done 9000 \
  bash -c 'python scripts/run_mu_dnn_tpu.py --snr -25 -20 -15 -10 -5 0 5 10 > results/mu_dnn_r4.log 2>&1 && touch results/mu_grid_r4.done'

commit_results "Round-4 artifacts: chain final sweep"
echo "=== chain_r4 done $(date) ==="
