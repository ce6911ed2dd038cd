#!/bin/bash
# Round-5 final chain: BS64 accuracy chapter FIRST (the one remaining
# VERDICT r4 item with no artifact), then re-produce the bench artifacts
# whose numbers are cited in RESULTS.md round-5 sections but whose files
# were lost with the previous environment (gen_bench_r5.json,
# train_bench_r5.log, awgn decomposition, fetch probe), then a final
# oracle-tier + headline-bench refresh.
# Same .done-sentinel gating as chain_r5.sh (ADVICE r4).
cd /root/repo
exec >> results/chain_r5c.log 2>&1

commit_results() {
  git add -A results/ 2>/dev/null
  git diff --cached --quiet || git commit -m "$1" 2>/dev/null
}

stage() {  # stage <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  local done_f="results/r5c_${name}.done"
  if [ -e "$done_f" ]; then echo "=== skip $name (done)"; return 0; fi
  echo "=== $name $(date) ==="
  if timeout "$to" "$@"; then
    touch "$done_f"
  else
    echo "--- $name exited rc=$? (no sentinel; will retry on re-run)"
  fi
  commit_results "Round-5 artifact: $name (final chain)"
  return 0
}

echo "=== chain_r5c start $(date) ==="

# 1. BS64 accuracy: corpus + train to convergence + protocol NMSE sweep
#    (VERDICT r4 #3 — the last item with no artifact)
stage bs64_accuracy 10800 python scripts/run_bs64_tpu_r5.py

# 2. headline inference bench refresh on the current tree
stage bench_r5 2400 bash -c 'python bench.py > results/bench_r5.json.tmp 2> results/bench_r5.err && tail -1 results/bench_r5.json.tmp > results/bench_r5.json'

# 3. generation throughput incl. the bf16 corpus-drain mode
stage gen_bench_r5 2400 bash -c 'python bench.py --gen > results/gen_bench_r5.json.tmp 2> results/gen_bench_r5.err && tail -1 results/gen_bench_r5.json.tmp > results/gen_bench_r5.json'

# 4. train-bench refresh: rbg_clt rows + the _noawgn decomposition row
stage train_bench_r5 4800 bash -c 'BENCH_TRAIN_VARIANTS=f32_rbg,f32_rbgclt,f32_noawgn BENCH_TRAIN_BATCHES=1024,2048 python bench.py --train > results/train_bench_r5.log 2>&1'

# 5. bare-transfer probe (bf16 drain post-mortem)
stage fetch_probe 1800 python scripts/probe_fetch_r5.py

# 6. oracle tier rerun on the final tree
stage tpu_checks_final 2400 python scripts/tpu_checks.py -o results/tpu_checks_r5.json

commit_results "Round-5 artifacts: final chain sweep"
echo "=== chain_r5c done $(date) ==="
