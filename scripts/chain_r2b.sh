#!/bin/bash
# Round-2 TPU chain, take 2. One job at a time on the single chip.
# The tunnel client leaks host memory across RPCs (the stage-3 sweep
# process was OOM-killed at 108 GB after 15 levels), so every per-SNR
# unit of work runs in its OWN python process — the scripts' per-level
# resume makes that free.
set -u
cd /root/repo

echo "[chain2] finishing the stage-3 sweep (one process per level)"
for snr in 0 5 10; do
  timeout 3600 python scripts/run_sweep_stage3.py --snr $snr \
    >> /tmp/stage3_sweep.log 2>&1
  echo "[chain2] sweep level $snr rc=$?"
done
# final pass re-orders + plots (all levels already done -> fast)
timeout 3600 python scripts/run_sweep_stage3.py >> /tmp/stage3_sweep.log 2>&1
echo "[chain2] sweep finalize rc=$?"

echo "[chain2] bench (int8 paths; both batches to warm the driver cache)"
timeout 14400 python bench.py > /tmp/bench_r2_int8.log 2>&1
echo "[chain2] bench rc=$?"

echo "[chain2] multi-user JSDM sweep"
timeout 7200 python scripts/run_mu_tpu.py > /tmp/mu_sweep.log 2>&1
echo "[chain2] mu rc=$?"

echo "[chain2] BS64 end-to-end (3000 pkts, reduced grid)"
python scripts/run_bs32_tpu.py --num-tx 64 --num-rx 8 --packets 3000 \
  --workdir runs/bs64_r2 --test-packets 500 \
  > /tmp/bs64_r2.log 2>&1
echo "[chain2] bs64 rc=$?"
