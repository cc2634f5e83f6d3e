#!/bin/bash
# Round-2 akropolis evidence stage (run AFTER the santorini training has
# been stopped; one TPU process at a time).  $1 = minutes of training.
set -u
cd /root/repo
MINUTES=${1:-14}
mkdir -p runs artifacts/strength

python -m alphazero_tpu.cli.main akropolis -e 2048 -P 2048 -m 100 -n 200 \
  --channels 128 --depth 6 -C runs/akropolis_r2 > runs/akropolis_r2.log 2>&1 &
TRAIN_PID=$!
echo "$(date +%H:%M:%S) akropolis training pid=$TRAIN_PID" >> runs/queue.log
sleep $((MINUTES * 60))
kill "$TRAIN_PID" 2>/dev/null
wait "$TRAIN_PID" 2>/dev/null
echo "$(date +%H:%M:%S) akropolis training stopped" >> runs/queue.log

# best vs the Undefeated-Strategy scripted bot (device search, host bot)
timeout 600 python -m alphazero_tpu.cli.pit akropolis runs/akropolis_r2/best \
  undefeated -n 32 -m 100 --seed 7 > runs/akro_vs_undef_100.out 2>&1
echo "$(date +%H:%M:%S) akro pit done rc=$?" >> runs/queue.log
tail -5 runs/akro_vs_undef_100.out
