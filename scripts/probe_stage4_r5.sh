#!/usr/bin/env bash
# Round-5 stage-4 feasibility probes (VERDICT r4 task 2): the round-4
# addendum localized the dyn-path fault to node-arena WIDTH at B=2048
# (OK at N=101, faults at N=201+).  Counter-move: shrink B so the
# (B, N, A) traversal footprint stays under the limit at high sims, and
# measure bf16 tree dtypes for pass bandwidth.  One timeout'd subprocess
# per probe with tunnel health checks between (docs/tpu_limits.md).
set -u
cd /root/repo
LOG=runs/probe_stage4_r5.log
: > "$LOG"
health() {
    timeout 90 python -c "
import jax, jax.numpy as jnp
print('health ok:', jax.jit(lambda x: x + 1)(jnp.ones(())))" >> "$LOG" 2>&1 \
        && echo "health ok" | tee -a "$LOG" || echo "HEALTH FAIL" | tee -a "$LOG"
}

probe() {
    echo "=== $* ===" | tee -a "$LOG"
    timeout 1200 python "$@" >> "$LOG" 2>&1
    rc=$?
    tail -1 "$LOG"
    [ $rc -ne 0 ] && echo "probe rc=$rc" | tee -a "$LOG"
    health
}

health
# args: MOVES BATCH SIMS UNIV FORCED CH DEPTH PCR_SPLIT DYN_SIMS QUOTA GAME DTYPE
# 1. smaller-B ladder at the faulting sims (recipe stage shapes, merged PCR)
probe scripts/probe_selfplay_dyn.py 124 1024 200 3 1 64 4 0 1 1024
probe scripts/probe_selfplay_dyn.py 124 1024 400 3 1 64 4 0 1 1024
probe scripts/probe_selfplay_dyn.py 124 1024 800 3 1 64 4 0 1 1024
probe scripts/probe_selfplay_dyn.py 124 512 800 3 1 64 4 0 1 512
# 2. bf16 tree dtypes: stage-1 shape (known-good fp32 = 244.6k sims/s)
probe scripts/probe_selfplay_dyn.py 124 2048 100 3 1 64 4 0 1 2048 splendor bfloat16
# 3. bf16 at the high-sims shapes — halves the (B,N,A) footprint, may
#    clear the width fault at bigger B too
probe scripts/probe_selfplay_dyn.py 124 2048 200 3 1 64 4 0 1 2048 splendor bfloat16
probe scripts/probe_selfplay_dyn.py 124 1024 800 3 1 64 4 0 1 1024 splendor bfloat16
echo "probe sequence done" | tee -a "$LOG"
