#!/bin/bash
# Second round-3 chain: timing re-runs that depend on code added after
# chain_r3_runs.sh started (rbg AWGN row in the train bench; the
# lmmse_direct column in the Nt sweep). Waits for the first chain.
cd /root/repo
exec >> results/chain_r3b.log 2>&1

wait_pid() {
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
}

echo "=== chain_r3b start $(date) (waiting on pid ${1:-none}) ==="
[ -n "$1" ] && wait_pid "$1"

echo "=== train bench (with f32_rbg row) $(date) ==="
timeout 5400 python bench.py --train

echo "=== Nt sweep (lmmse_direct column) $(date) ==="
timeout 7200 python scripts/timing_nt_sweep.py --batch 64 --iters 10 \
  -o results/timing_nt_sweep.json

echo "=== chain_r3b done $(date) ==="
