#!/bin/bash
# Round-2 CPU-side anchor matches (run detached while the chip trains
# splendor; single host core — keep everything here SEQUENTIAL).
# Appends committed evidence to artifacts/strength/ref_match.jsonl.
set -u
cd /root/repo
OUT=artifacts/strength/ref_match.jsonl
mkdir -p artifacts/strength
echo "$(date +%H:%M:%S) anchor start" >> runs/queue.log

# santorini: vs the reference's committed glicko-2249 pretrained net
# (santorini/README.md:44), same protocol as the prior committed rows
python -m alphazero_tpu.cli.ref_match runs/santorini_r2/best \
  -n 30 -m 100 --ref-sims 100 --seed 99 --out "$OUT" \
  >> runs/anchor.log 2>&1
echo "$(date +%H:%M:%S) santorini 100-sims anchor done" >> runs/queue.log
python -m alphazero_tpu.cli.ref_match runs/santorini_r2/best \
  -n 10 -m 800 --ref-sims 800 --seed 77 --out "$OUT" \
  >> runs/anchor.log 2>&1
echo "$(date +%H:%M:%S) santorini 800-sims anchor done" >> runs/queue.log

# splendor: vs the reference's committed pretrained_2players.pt (the
# BASELINE.json north-star opponent), after splendor training finishes
while pgrep -f "cli.main splendor" >/dev/null 2>&1; do sleep 60; done
while [ ! -f runs/splendor_r2/best/params.msgpack ]; do sleep 60; done
python -m alphazero_tpu.cli.ref_match runs/splendor_r2/best \
  --game splendor -n 20 -m 100 --ref-sims 100 --seed 55 --out "$OUT" \
  >> runs/anchor.log 2>&1
echo "$(date +%H:%M:%S) splendor 100-sims anchor done" >> runs/queue.log
