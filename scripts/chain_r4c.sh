#!/bin/bash
# Round-4 chain part 3: re-runs for artifacts invalidated by fixes that
# landed mid-round — the NF receiver fix (noise now amplified with the
# signal) and the double-buffered generation pipeline + device-only
# sounding row. Waits for chain_r4b to release the chip.
cd /root/repo
exec >> results/chain_r4c.log 2>&1

DEADLINE=$(( $(date +%s) + 8*3600 ))
echo "=== chain_r4c start $(date) ==="
until grep -q "chain_r4b done" results/chain_r4b.log 2>/dev/null; do
  [ "$(date +%s)" -gt "$DEADLINE" ] && { echo "deadline waiting"; exit 0; }
  sleep 60
done
echo "=== chain_r4b released the chip $(date) ==="

commit_results() {
  git add -A results/ 2>/dev/null
  git diff --cached --quiet || git commit -m "$1" 2>/dev/null
}

stage() {  # stage <name> <artifact> <timeout_s> <cmd...>
  local name=$1 art=$2 to=$3; shift 3
  [ "$(date +%s)" -gt "$DEADLINE" ] && { echo "deadline"; exit 0; }
  if [ -e "$art" ]; then echo "=== skip $name ($art present)"; return 0; fi
  echo "=== $name $(date) ==="
  timeout "$to" "$@"
  local rc=$?
  [ $rc -ne 0 ] && echo "--- $name exited rc=$rc"
  commit_results "Round-4 artifact: $name"
  return 0
}

# NF sweep on the fixed receiver (first artifact was invalid: gain was
# applied to the signal only, so LS came out ~gain_db too clean)
stage nf_sweep_fixed results/nf_sweep.json 2400 python scripts/run_nf_tpu.py

# generation bench on the double-buffered pipeline + device-only row
stage gen_bench_b results/gen_bench_r4b.json 2700 \
  bash -c 'python bench.py --gen > results/gen_bench_r4b.json.tmp 2> results/gen_bench_r4b.err && tail -1 results/gen_bench_r4b.json.tmp > results/gen_bench_r4b.json'

commit_results "Round-4 artifacts: chain_r4c final sweep"
echo "=== chain_r4c done $(date) ==="
