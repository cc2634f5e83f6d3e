#!/usr/bin/env bash
# Round-5 evening match queue, revision b: waits for the azul training
# process (PID $1) to exit, snapshots its best, then runs the remaining
# CPU anchors.  (Revision a ran before the abalone crash re-planned the
# second anchor to azul.)
set -u
cd /root/repo
AZUL_PID=${1:?usage: matches_queue_r5b.sh <azul_train_pid>}
M=runs/matches_queue_r5.log
log() { echo "[$(date +%H:%M:%S)] $*" >> "$M"; }

log "waiting for azul train (pid $AZUL_PID)"
while kill -0 "$AZUL_PID" 2>/dev/null; do sleep 60; done
log "azul train done; snapshotting"
python scripts/snapshot_ckpt.py runs/azul_r5/best azul_r5_best \
    >> "$M" 2>&1 || log "azul snapshot failed"

# 1. Akropolis vs the Undefeated bot (reference ~75% anchor)
log "akropolis vs undefeated start"
timeout 5400 python -m alphazero_tpu.cli.pit akropolis \
    artifacts/strength/ckpts/akropolis_r5_best undefeated \
    -n 32 -m 100 --seed 7 --cpu \
    --out artifacts/strength/akropolis_vs_undef.jsonl >> "$M" 2>&1
log "akropolis rc=$?"

# 2. Azul second anchor vs the committed pretrained.pt
log "azul ref_match start"
timeout 5400 python -m alphazero_tpu.cli.ref_match \
    artifacts/strength/ckpts/azul_r5_best --game azul \
    -n 20 -m 100 --ref-sims 100 --seed 13 \
    --out artifacts/strength/ref_match.jsonl >> "$M" 2>&1
log "azul rc=$?"

# 3. Splendor at 800 sims (the native budget of both nets)
log "splendor ref_match 800 sims start"
timeout 10800 python -m alphazero_tpu.cli.ref_match \
    artifacts/strength/ckpts/splendor_r5_best --game splendor \
    -n 20 -m 800 --ref-sims 800 --seed 43 \
    --out artifacts/strength/ref_match.jsonl >> "$M" 2>&1
log "splendor800 rc=$?"
log "MATCH QUEUE B DONE"
