#!/bin/bash
# Third round-3 chain: host-streaming retry (memory-lean tiling) after
# chain_r3b's timing runs release the chip.
cd /root/repo
exec >> results/chain_r3c.log 2>&1
wait_pid() { while kill -0 "$1" 2>/dev/null; do sleep 30; done; }
echo "=== chain_r3c start $(date) (waiting on pid ${1:-none}) ==="
[ -n "$1" ] && wait_pid "$1"
echo "=== host-streaming scale (lean retry) $(date) ==="
timeout 10800 python scripts/run_hoststream_tpu.py
echo "=== chain_r3c done $(date) ==="
