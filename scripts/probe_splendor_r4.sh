#!/usr/bin/env bash
# Round-4 splendor probe sequence: measure the rewritten masked engine +
# dyn path at the exact recipe stage shapes, one timeout'd subprocess per
# probe with tunnel health checks between (memory: never leave a hanging
# client attached; fault class 2 wedges new clients ~25-30 min).
set -u
LOG=runs/probe_splendor_r4_$(date +%H%M).log
health() {
    timeout 90 python -c "
import jax, jax.numpy as jnp
print('health ok:', jax.jit(lambda x: x + 1)(jnp.ones(())))" >> "$LOG" 2>&1 \
        && echo "health ok" || echo "HEALTH FAIL"
}

probe() {
    echo "=== $* ===" | tee -a "$LOG"
    timeout 2400 python "$@" >> "$LOG" 2>&1
    rc=$?
    tail -1 "$LOG"
    [ $rc -ne 0 ] && echo "probe rc=$rc"
    health
}

health
# stage-1 shape: dyn, merged PCR, sims=100, mixer 64x4
probe scripts/probe_selfplay_dyn.py 124 2048 100 3 1 64 4 0 1 2048
# stage-4 shape: dyn, merged PCR, sims=800 (the production north-star shape)
probe scripts/probe_selfplay_dyn.py 124 2048 800 3 1 64 4 0 1 2048
# scan path at the OLD safe chunk for comparison (masked engine, split PCR)
probe scripts/probe_selfplay_chunk.py 8 2048 100 3 1 64 4 4 1
echo "probe sequence done" | tee -a "$LOG"
