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

# verify the checkpoint loads before spending pit time on it (the SIGTERM
# above can land mid-save on pre-atomic-write checkpoints)
python -c "
import sys; sys.path.insert(0, '/root/repo')
from alphazero_tpu.train.checkpoint import params_hash
print('ckpt ok sha=' + params_hash('runs/akropolis_r2/best'))" \
  >> runs/queue.log 2>&1

# best vs the Undefeated-Strategy scripted bot (device search, host bot).
# timeout scales with game count (~35 s/game measured for host-side
# opponents); capture rc IMMEDIATELY — an rc=$? inside a $(date) word
# would report the substitution's status, not the pit's
N=32
timeout $((60 * N)) python -m alphazero_tpu.cli.pit akropolis \
  runs/akropolis_r2/best undefeated -n $N -m 100 --seed 7 \
  > runs/akro_vs_undef_100.out 2>&1
rc=$?
if [ "$rc" -eq 124 ]; then
  echo "$(date +%H:%M:%S) akro pit TIMED OUT" >> runs/queue.log
else
  echo "$(date +%H:%M:%S) akro pit done rc=$rc" >> runs/queue.log
fi
tail -5 runs/akro_vs_undef_100.out
