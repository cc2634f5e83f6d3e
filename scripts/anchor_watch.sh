#!/bin/bash
# Sequentially run the strength-anchor matches as training checkpoints
# appear (all CPU-side; safe alongside TPU training).
set -u
RUN=runs/santorini_r2
OUT=artifacts/strength/ref_match.jsonl
mkdir -p artifacts/strength

# wait for a checkpoint dir to be complete (params.msgpack present)
wait_ckpt () {
  while [ ! -f "$1/params.msgpack" ]; do sleep 30; done
  sleep 5
}

wait_ckpt "$RUN/iter_0018"
python -m alphazero_tpu.cli.ref_match "$RUN/iter_0018" -n 10 -m 100 \
  --ref-sims 100 --seed 18 --out "$OUT" >> /tmp/refmatch_watch.log 2>&1

# wait for training to finish (log line 'training done' or process exit),
# then final matches vs best
while pgrep -f "cli.main santorini" > /dev/null 2>&1; do sleep 60; done
python -m alphazero_tpu.cli.ref_match "$RUN/best" -n 30 -m 100 \
  --ref-sims 100 --seed 99 --out "$OUT" >> /tmp/refmatch_watch.log 2>&1
python -m alphazero_tpu.cli.ref_match "$RUN/best" -n 10 -m 800 \
  --ref-sims 800 --seed 77 --out "$OUT" >> /tmp/refmatch_watch.log 2>&1
echo "anchor_watch done"
