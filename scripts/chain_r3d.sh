#!/bin/bash
# Round-3 restart chain (fresh container: runs/ and .jax_cache are gone).
# Serialized TPU jobs, highest-value missing artifacts first:
#   1. Nt sweep with the lmmse_direct column (fast)
#   2. MU-DNN protocol sweep (VERDICT item 5 — the one "missing" artifact)
#   3. train bench with the f32_rbg row
#   4. train parity f32 vs bf16
#   5. host-streaming scale retry (lean tiling) — longest, most OOM-risky
cd /root/repo
exec >> results/chain_r3d.log 2>&1

echo "=== chain_r3d start $(date) ==="

echo "=== Nt sweep (lmmse_direct column) $(date) ==="
timeout 3600 python scripts/timing_nt_sweep.py --batch 64 --iters 10 \
  -o results/timing_nt_sweep.json

echo "=== MU-DNN protocol sweep $(date) ==="
timeout 7200 python scripts/run_mu_dnn_tpu.py

echo "=== train bench (f32_rbg row) $(date) ==="
timeout 3600 python bench.py --train

echo "=== train parity f32 vs bf16 $(date) ==="
timeout 5400 python scripts/run_train_parity_tpu.py

echo "=== host-streaming scale (lean retry) $(date) ==="
timeout 5400 python scripts/run_hoststream_tpu.py

echo "=== chain_r3d done $(date) ==="
