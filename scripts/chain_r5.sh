#!/bin/bash
# Round-5 TPU job chain: one chip, strictly serial. Every stage gates on
# a .done SENTINEL touched only after the command exits 0 (ADVICE r4:
# gating on a log/JSON the command's own redirection creates at stage
# start lets a failed/timed-out stage be silently skipped on re-run).
cd /root/repo
exec >> results/chain_r5.log 2>&1

commit_results() {
  git add -A results/ runs/bs64/test_results runs/bs64/history.json 2>/dev/null
  git diff --cached --quiet || git commit -m "$1" 2>/dev/null
}

stage() {  # stage <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  local done_f="results/r5_${name}.done"
  if [ -e "$done_f" ]; then echo "=== skip $name (done)"; return 0; fi
  echo "=== $name $(date) ==="
  if timeout "$to" "$@"; then
    touch "$done_f"
  else
    echo "--- $name exited rc=$? (no sentinel; will retry on re-run)"
  fi
  commit_results "Round-5 artifact: $name"
  return 0
}

echo "=== chain_r5 start $(date) ==="

# 1. on-chip oracle tier — the round's gate, runs FIRST (VERDICT r4 #1)
stage tpu_checks 2400 python scripts/tpu_checks.py -o results/tpu_checks_r5.json

# 2. convergence-parity gate for the rbg_clt AWGN draw (corpus cached)
stage parity_rbgclt 7200 python scripts/run_train_parity_tpu.py --variants f32,f32_rbgclt

# 3. mixed-precision LMMSE-CG frontier at Nt=64 and Nt=32
stage cg_mixed_nt64 2400 python scripts/probe_cg_mixed_r5.py
stage cg_mixed_nt32 2400 python scripts/probe_cg_mixed_r5.py --num-tx 32 --num-rx 4 -o results/probe_cg_mixed_r5_nt32.json

# 4. generation throughput incl. the bf16 corpus-drain mode
stage gen_bench_r5 2400 bash -c 'python bench.py --gen > results/gen_bench_r5.json.tmp 2> results/gen_bench_r5.err && tail -1 results/gen_bench_r5.json.tmp > results/gen_bench_r5.json'

# 5. train-bench refresh with the rbg_clt row (headline train numbers)
stage train_bench_r5 4800 bash -c 'BENCH_TRAIN_VARIANTS=f32_rbg,f32_rbgclt,bf16_rbgclt BENCH_TRAIN_BATCHES=1024,2048 python bench.py --train > results/train_bench_r5.log 2>&1'

# 6. BS64 accuracy chapter: corpus + train to convergence + NMSE sweep
stage bs64_accuracy 21600 python scripts/run_bs32_tpu.py \
  --num-tx 64 --num-rx 8 --packets 2000 --test-packets 250 \
  --epochs 100 --workdir runs/bs64 \
  --snr -25 -20 -15 -10 -5 0 5 10

# 7. headline inference bench refresh
stage bench_r5 2400 bash -c 'python bench.py > results/bench_r5.json.tmp 2> results/bench_r5.err && tail -1 results/bench_r5.json.tmp > results/bench_r5.json'

commit_results "Round-5 artifacts: chain final sweep"
echo "=== chain_r5 done $(date) ==="
