#!/usr/bin/env bash
# Azul take 3: the take-2 dyn run at B=2048 hit a RUNTIME kernel fault in
# self-play — consistent with the splendor width fault: azul's (B,N,A)
# traversal at B=2048/N=101/A=180 is ~37M elements vs the ~25M boundary
# splendor faulted at (B=2048/N~150/A=81).  B=1024 puts azul at ~18.6M,
# under the boundary.  Probe health first (one short client per minute).
set -u
cd /root/repo
L=runs/azul_retry2_r5.log
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

log "azul train take 3 (dyn, B=1024) start"
timeout 9000 python -m alphazero_tpu.cli.main azul -C runs/azul_r5c \
    -n 16 -m 100 -V 1 --channels 128 --depth 6 \
    -P 1024 -e 1024 -b 512 -p 4 -i 5 -l 0.002 -q 0.5 -u 3 \
    --dyn --pcr-merged \
    --updateThreshold 0.55 --arenaCompare 300 -s 25 \
    --seed 17 > runs/azul_r5c.log 2>&1
log "azul train rc=$?"
python scripts/snapshot_ckpt.py runs/azul_r5c/best azul_r5_best \
    >> "$L" 2>&1 || log "snapshot failed"
log "AZUL RETRY2 DONE"
