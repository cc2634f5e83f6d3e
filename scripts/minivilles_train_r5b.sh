#!/usr/bin/env bash
# Minivilles train (second-anchor fallback after azul faulted the worker
# at every batch size): A=21 keeps the (B,N,A) traversal at 4.3M elements
# (6x under splendor's known-good shape) and the dyn path keeps the
# program one move+sim body despite max_game_length=260.  Probe worker
# health first (one short client per minute, never stacking clients).
set -u
cd /root/repo
L=runs/minivilles_train_r5b.log
: > "$L"
log() { echo "[$(date +%H:%M:%S)] $*" >> "$L"; }

log "probing for worker recovery"
for i in $(seq 1 45); do
    if timeout 90 python -c "
import jax, jax.numpy as jnp
print(jax.jit(lambda x: x + 1)(jnp.ones(())))" >> "$L" 2>&1; then
        log "worker healthy after $i probes"
        break
    fi
    sleep 60
done

log "minivilles train (dyn, B=2048) start"
timeout 9000 python -m alphazero_tpu.cli.main minivilles -C runs/minivilles_r5b \
    -n 16 -m 100 -V 1 --channels 64 --depth 4 \
    -P 2048 -e 2048 -b 512 -p 4 -i 5 -l 0.002 -q 0.5 -u 3 \
    --dyn --pcr-merged \
    --updateThreshold 0.55 --arenaCompare 300 -s 25 \
    --seed 17 > runs/minivilles_r5b.log 2>&1
log "minivilles train rc=$?"
python scripts/snapshot_ckpt.py runs/minivilles_r5b/best minivilles_r5_best \
    >> "$L" 2>&1 || log "snapshot failed"
log "MINIVILLES B DONE"
