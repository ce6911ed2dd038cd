#!/bin/bash
# Post-training TPU chain for round 1: wait for the BS32 run (pid $1),
# then closed-loop eval + throughput benches, all logged.
set -x
PID=${1:?usage: after_train_r1.sh <train_pid>}
cd /root/repo
tail --pid="$PID" -f /dev/null   # wait for training+sweep to finish
sleep 5
timeout 7200 python scripts/run_closed_loop_tpu.py --workdir runs/bs32 \
    > runs/closed_loop.log 2>&1
BENCH_ITERS=20 timeout 7200 python bench.py > runs/bench_r1.json 2> runs/bench_r1.log
BENCH_NT=64 BENCH_NR=8 BENCH_BATCH=256 BENCH_ITERS=20 timeout 7200 python bench.py \
    > runs/bench_bs64_r1.json 2> runs/bench_bs64_r1.log
echo DONE > runs/after_train_done
