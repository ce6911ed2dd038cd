#!/bin/bash
# Round-4 chain part 4: SINR-DNN re-run with per-sample RMS
# normalization (input_norm='rms') — the first run exposed that the
# sinr gain-0 convention sits ~100 dB below the training scale, so the
# unnormalized cross-evaluation failed by pure scale. Corpora are
# reused via hardlinks (they do not depend on the normalization).
cd /root/repo
exec >> results/chain_r4d.log 2>&1

DEADLINE=$(( $(date +%s) + 10*3600 ))
echo "=== chain_r4d start $(date) ==="
until grep -q "chain_r4c done" results/chain_r4c.log 2>/dev/null; do
  [ "$(date +%s)" -gt "$DEADLINE" ] && { echo "deadline waiting"; exit 0; }
  sleep 60
done
echo "=== chain_r4c released the chip $(date) ==="

commit_results() {
  git add -A results/ 2>/dev/null
  git diff --cached --quiet || git commit -m "$1" 2>/dev/null
}

if [ ! -e results/sinr_dnn_rms_r4.done ]; then
  echo "=== sinr_dnn_rms $(date) ==="
  for m in awgn sinr; do
    mkdir -p runs/sinr_dnn2/$m
    [ -e runs/sinr_dnn2/$m/train.npz ] || \
      ln runs/sinr_dnn/$m/train.npz runs/sinr_dnn2/$m/train.npz 2>/dev/null
  done
  timeout 9000 bash -c 'python scripts/run_sinr_dnn_tpu.py > results/sinr_dnn_rms.log 2>&1' \
    && touch results/sinr_dnn_rms_r4.done
  commit_results "Round-4 artifact: sinr_dnn_rms (scale-equivariant re-run)"
else
  echo "=== skip sinr_dnn_rms"
fi

commit_results "Round-4 artifacts: chain_r4d final sweep"
echo "=== chain_r4d done $(date) ==="
