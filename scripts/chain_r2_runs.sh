#!/bin/bash
# Round-2 TPU job chain: wait for the stage-3 sweep (if running), then
# (1) the protocol closed loop (500 pkts/SNR), (2) the headline bench
# incl. the int8 paths, (3) the multi-user JSDM sweep artifact, and
# (4) the BS64 end-to-end run (longest, checkpoint-resumable, last).
# One TPU job at a time (single tunneled chip).
set -u
cd /root/repo

SWEEP_PID="${1:-}"
if [ -n "$SWEEP_PID" ]; then
  echo "[chain] waiting on sweep pid $SWEEP_PID"
  while kill -0 "$SWEEP_PID" 2>/dev/null; do sleep 20; done
  echo "[chain] sweep done"
fi

echo "[chain] closed loop protocol (500 pkts/SNR)"
python scripts/run_closed_loop_tpu.py --packets 500 \
  > /tmp/closed_loop_protocol.log 2>&1
echo "[chain] closed loop rc=$?"

echo "[chain] bench (int8 paths; both batches so the driver's own"
echo "[chain] end-of-round bench.py run hits a warm compile cache)"
timeout 14400 python bench.py > /tmp/bench_r2_int8.log 2>&1
echo "[chain] bench rc=$?"

echo "[chain] multi-user JSDM sweep"
timeout 7200 python scripts/run_mu_tpu.py > /tmp/mu_sweep.log 2>&1
echo "[chain] mu rc=$?"

echo "[chain] BS64 end-to-end (3000 pkts, reduced grid)"
python scripts/run_bs32_tpu.py --num-tx 64 --num-rx 8 --packets 3000 \
  --workdir runs/bs64_r2 --test-packets 500 \
  > /tmp/bs64_r2.log 2>&1
echo "[chain] bs64 rc=$?"
