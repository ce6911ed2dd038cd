#!/bin/bash
# Round-1 supervisor: keep the BS32 run alive through tunnel hangs
# (restart the EXACT pid when the log goes silent), then run the
# closed-loop eval + throughput benches.
cd /root/repo
LOG=runs/bs32.log
DONE=runs/bs32/test_results/sweep.json
STALL=420   # seconds of log silence => hung tunnel RPC
PIDFILE=runs/bs32.pid

log() { echo "[supervisor $(date +%H:%M:%S)] $*" >> runs/supervisor.log; }

while [ ! -f "$DONE" ]; do
  PID=$(cat "$PIDFILE" 2>/dev/null)
  if [ -z "$PID" ] || ! kill -0 "$PID" 2>/dev/null; then
    nohup python scripts/run_bs32_tpu.py --workdir runs/bs32 --epochs 300 >> "$LOG" 2>&1 &
    echo $! > "$PIDFILE"
    log "started trainer pid $(cat $PIDFILE)"
    sleep 60
    continue
  fi
  AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
  if [ "$AGE" -gt "$STALL" ]; then
    log "log silent ${AGE}s; killing hung trainer $PID"
    kill "$PID" 2>/dev/null
    sleep 5
    kill -9 "$PID" 2>/dev/null
  fi
  sleep 30
done
log "training+sweep complete; running closed loop + benches"
timeout 2700 python scripts/run_closed_loop_tpu.py --workdir runs/bs32 \
    > runs/closed_loop.log 2>&1
log "closed loop rc=$?"
BENCH_ITERS=20 timeout 2700 python bench.py > runs/bench_r1.json 2> runs/bench_r1.log
log "bench bs32 rc=$?"
BENCH_NT=64 BENCH_NR=8 BENCH_BATCH=256 BENCH_ITERS=20 timeout 2700 python bench.py \
    > runs/bench_bs64_r1.json 2> runs/bench_bs64_r1.log
log "bench bs64 rc=$?"
echo DONE > runs/after_train_done
