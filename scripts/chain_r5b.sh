#!/bin/bash
# Round-5 follow-up chain (runs after chain_r5.sh): extended CG
# precision grid, in-bench AWGN decomposition, transfer-overhead probe,
# and a final oracle-tier rerun under the new rbg_clt training default.
# Same .done-sentinel gating as chain_r5.sh.
cd /root/repo
exec >> results/chain_r5b.log 2>&1

commit_results() {
  git add -A results/ 2>/dev/null
  git diff --cached --quiet || git commit -m "$1" 2>/dev/null
}

stage() {  # stage <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  local done_f="results/r5b_${name}.done"
  if [ -e "$done_f" ]; then echo "=== skip $name (done)"; return 0; fi
  echo "=== $name $(date) ==="
  if timeout "$to" "$@"; then
    touch "$done_f"
  else
    echo "--- $name exited rc=$? (no sentinel; will retry on re-run)"
  fi
  commit_results "Round-5 artifact: $name (follow-up chain)"
  return 0
}

echo "=== chain_r5b start $(date) ==="

# 1. extended CG precision grid (adds cg_high / cg_high_hp variants)
stage cg_grid_nt64 2400 python scripts/probe_cg_mixed_r5.py -o results/probe_cg_mixed_r5.json
stage cg_grid_nt32 2400 python scripts/probe_cg_mixed_r5.py --num-tx 32 --num-rx 4 -o results/probe_cg_mixed_r5_nt32.json

# 2. in-bench AWGN decomposition (the bench's dispatch pattern is the
#    steady-state truth; the _noawgn row gives the in-harness floor)
stage train_awgn_decomp 4800 bash -c 'BENCH_TRAIN_VARIANTS=f32_rbg,f32_rbgclt,f32_noawgn BENCH_TRAIN_BATCHES=2048 python bench.py --train > results/train_awgn_decomp_r5.log 2>&1'

# 3. bare-transfer probe (bf16 drain post-mortem)
stage fetch_probe 1800 python scripts/probe_fetch_r5.py

# 4. oracle tier rerun under the new training default
stage tpu_checks_final 2400 python scripts/tpu_checks.py -o results/tpu_checks_r5.json

commit_results "Round-5 artifacts: follow-up chain final"
echo "=== chain_r5b done $(date) ==="
