#!/bin/bash
# Round-2 sequential TPU workload queue: runs after the in-flight akropolis
# training finishes so the chip never idles.  Each stage appends raw results
# under runs/ (scratch); committed evidence is copied into artifacts/ by hand.
# NOTE this box has ONE host core: never run CPU-heavy work in parallel with
# a training's host process unless it is the deliberate overlap (ref_match).
set -u
cd /root/repo
mkdir -p runs artifacts/strength
echo "$(date +%H:%M:%S) queue start" >> runs/queue.log

# 1. wait for the running akropolis training to finish
while pgrep -f "cli.main akropolis" >/dev/null 2>&1; do sleep 60; done
echo "$(date +%H:%M:%S) akropolis training done" >> runs/queue.log

# 2. akropolis best vs the Undefeated-Strategy scripted bot (device search,
#    host bot) — the BASELINE.md ~75% anchor
python -m alphazero_tpu.cli.pit akropolis runs/akropolis_r2/best undefeated \
  -n 64 -m 100 --seed 7 > runs/akro_vs_undef_100.out 2>&1
echo "$(date +%H:%M:%S) akro pit m=100 done" >> runs/queue.log
python -m alphazero_tpu.cli.pit akropolis runs/akropolis_r2/best undefeated \
  -n 30 -m 800 --seed 8 > runs/akro_vs_undef_800.out 2>&1
echo "$(date +%H:%M:%S) akro pit m=800 done" >> runs/queue.log

# 3. santorini retrain FIRST (regenerates the lost strength-evidence
#    artifacts: anchor matches + ladder + metrics after the scratch wipe)
python -m alphazero_tpu.cli.main santorini \
  --variant '{"nb_gods":1,"init_method":1}' -e 2048 -P 2048 -m 100 -n 45 \
  --channels 128 --depth 6 -C runs/santorini_r2 > runs/santorini_r2.log 2>&1
echo "$(date +%H:%M:%S) santorini training done" >> runs/queue.log

# 4. splendor training (BASELINE north star: parity vs pretrained_2players.pt)
#    search settings follow the reference's tuned splendor recipe
#    (/root/reference/README.md:152-163: cpuct 2.5, fpu 0.1, forced
#    playouts, q-weight 0.5) at a mid-ladder sim budget.
#    The santorini CPU anchor matches overlap this stage (host core is
#    otherwise idle while the chip trains).
python -m alphazero_tpu.cli.main splendor -e 2048 -P 2048 -m 200 -n 50 \
  -c 2.5 -f 0.1 -F -q 0.5 \
  --channels 128 --depth 6 -V 1 -C runs/splendor_r2 > runs/splendor_r2.log 2>&1
echo "$(date +%H:%M:%S) splendor training done" >> runs/queue.log
