#!/usr/bin/env bash
# Azul train take 2, after the full-scan program (max_game_length=360 —
# 360 stacked 100-sim scan bodies) crashed the TPU worker: wait for
# worker recovery (ONE short-timeout probe per minute, never stacking
# clients — docs/tpu_limits.md), then train on the dyn path (one
# move+sim while_loop body, the proven splendor stage-1 shape) with
# merged PCR.
set -u
cd /root/repo
L=runs/azul_retry_r5.log
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

log "azul train take 2 (dyn path) start"
timeout 9900 python -m alphazero_tpu.cli.main azul -C runs/azul_r5b \
    -n 20 -m 100 -V 1 --channels 128 --depth 6 \
    -P 2048 -e 2048 -b 512 -p 4 -i 5 -l 0.002 -q 0.5 -u 3 \
    --dyn --pcr-merged \
    --updateThreshold 0.55 --arenaCompare 300 -s 25 \
    --seed 17 > runs/azul_r5b.log 2>&1
log "azul train rc=$?"
python scripts/snapshot_ckpt.py runs/azul_r5b/best azul_r5_best \
    >> "$L" 2>&1 || log "snapshot failed"
log "AZUL RETRY DONE"
