#!/bin/bash
# Round-2 TPU job chain: wait for the stage-3 sweep (if running), then
# the protocol closed loop (500 pkts/SNR), then the BS64 end-to-end run.
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

echo "[chain] BS64 end-to-end (3000 pkts, reduced grid)"
python scripts/run_bs32_tpu.py --num-tx 64 --num-rx 8 --packets 3000 \
  --workdir runs/bs64_r2 --test-packets 500 \
  > /tmp/bs64_r2.log 2>&1
echo "[chain] bs64 rc=$?"
