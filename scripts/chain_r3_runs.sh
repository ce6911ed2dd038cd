#!/bin/bash
# Round-3 serialized TPU job chain (one chip — timing jobs must not
# overlap). Waits for any running bench first, then runs each stage,
# logging to results/. Re-runnable: stages with existing artifacts are
# cheap (compile-cached, resumable corpora/checkpoints).
cd /root/repo
exec >> results/chain_r3.log 2>&1

wait_pid() {
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
}

echo "=== chain_r3 start $(date) (waiting on pid ${1:-none}) ==="
[ -n "$1" ] && wait_pid "$1"

echo "=== Nt sweep refresh $(date) ==="
timeout 7200 python scripts/timing_nt_sweep.py --batch 64 --iters 10 \
  -o results/timing_nt_sweep.json

echo "=== probe_r3d (train-step decomposition) $(date) ==="
timeout 5400 python scripts/probe_r3d.py

echo "=== host-streaming scale $(date) ==="
timeout 7200 python scripts/run_hoststream_tpu.py

echo "=== train parity f32 vs bf16 $(date) ==="
timeout 10800 python scripts/run_train_parity_tpu.py

echo "=== MU-DNN protocol sweep $(date) ==="
timeout 14400 python scripts/run_mu_dnn_tpu.py

echo "=== chain_r3 done $(date) ==="
