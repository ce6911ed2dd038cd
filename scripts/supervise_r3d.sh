#!/bin/bash
# Fallback supervisor for chain_r3d: launched with setsid so it can
# outlive the interactive session that spawned the chain. Polls the
# chain's bash PID ($1); when the chain is gone it runs whichever
# stages have no artifact yet (serialized, one chip), committing each
# as it lands. Hard-stops after DEADLINE to never fight a future
# session for the chip.
cd /root/repo
exec >> results/supervisor_r3d.log 2>&1
CHAIN_PID=${1:?usage: supervise_r3d.sh <chain_pid>}
DEADLINE=$(( $(date +%s) + 4*3600 ))

echo "=== supervisor start $(date) watching pid $CHAIN_PID ==="
while kill -0 "$CHAIN_PID" 2>/dev/null; do
  [ "$(date +%s)" -gt "$DEADLINE" ] && { echo "deadline while waiting"; exit 0; }
  sleep 60
done
echo "=== chain gone $(date); checking artifacts ==="

commit_results() {
  git add -A results/ 2>/dev/null
  git diff --cached --quiet || git commit -m "$1" 2>/dev/null
}

have_mu_dnn() {
  python - <<'EOF'
import json, sys
try:
    d = json.load(open("results/mu_sweep_tpu.json"))
    sys.exit(0 if "dnn" in d.get("sources", {}) else 1)
except Exception:
    sys.exit(1)
EOF
}

# gate on the round-specific artifact ONLY: the committed cumulative
# chain log ships with the repo, so grepping it would let any earlier
# round's marker permanently satisfy the check (ADVICE r3)
have_train_bench() { grep -q train_step_tflops results/train_bench_r3.log 2>/dev/null; }

guard() {
  [ "$(date +%s)" -gt "$DEADLINE" ] && { echo "deadline reached"; exit 0; }
  return 0
}

guard
if have_mu_dnn; then echo "skip mu_dnn (dnn row present)"; else
  echo "=== mu_dnn $(date) ==="
  timeout 7200 python scripts/run_mu_dnn_tpu.py
  commit_results "Round-3 artifact: MU-DNN protocol sweep (supervisor re-run after chain interrupt)"
fi

guard
if have_train_bench; then echo "skip train bench"; else
  echo "=== train bench $(date) ==="
  timeout 3600 bash -c 'python bench.py --train > results/train_bench_r3.log 2>&1'
  commit_results "Round-3 artifact: train bench with f32_rbg row (supervisor re-run)"
fi

guard
if [ -e results/train_parity.json ]; then echo "skip parity"; else
  echo "=== train parity $(date) ==="
  timeout 5400 python scripts/run_train_parity_tpu.py
  commit_results "Round-3 artifact: f32-vs-bf16 train parity (supervisor re-run)"
fi

guard
if [ -e results/hoststream_scale.json ]; then echo "skip hoststream"; else
  echo "=== hoststream $(date) ==="
  timeout 5400 python scripts/run_hoststream_tpu.py
  commit_results "Round-3 artifact: host-streaming scale test (supervisor re-run)"
fi

commit_results "Round-3 artifacts: supervisor final sweep"
echo "=== supervisor done $(date) ==="
