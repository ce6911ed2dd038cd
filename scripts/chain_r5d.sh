#!/bin/bash
# Round-5 follow-up chain (runs after chain_r5c.sh): BS64 closed-loop
# spot check (the second half of VERDICT r4 #3) and the extended CG
# precision grid (cg_high / cg_high_hp rows RESULTS.md §3 promises).
# Same .done-sentinel gating as chain_r5c.sh.
cd /root/repo
exec >> results/chain_r5d.log 2>&1

commit_results() {
  git add -A results/ 2>/dev/null
  git diff --cached --quiet || git commit -m "$1" 2>/dev/null
}

stage() {  # stage <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  local done_f="results/r5d_${name}.done"
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

echo "=== chain_r5d start $(date) ==="

# 1. BS64 closed-loop spot check: two protocol SNR levels through the
#    full data-transmission chain with the converged BS64 model
stage bs64_closed_loop 3600 bash -c '
  python scripts/run_closed_loop_tpu.py --workdir runs/bs64 \
      --snr -15 -5 --packets 250 &&
  mkdir -p results/bs64 &&
  cp runs/bs64/test_results/closed_loop_protocol.json results/bs64/ &&
  { cp runs/bs64/test_results/protocol_*.png results/bs64/ 2>/dev/null || true; }'

# 2. extended CG precision grid (adds cg_high / cg_high_hp rows)
stage cg_grid_nt64 2400 python scripts/probe_cg_mixed_r5.py -o results/probe_cg_mixed_r5.json
stage cg_grid_nt32 2400 python scripts/probe_cg_mixed_r5.py --num-tx 32 --num-rx 4 -o results/probe_cg_mixed_r5_nt32.json

commit_results "Round-5 artifacts: follow-up chain final"
echo "=== chain_r5d done $(date) ==="
