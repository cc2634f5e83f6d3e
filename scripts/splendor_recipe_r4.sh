#!/usr/bin/env bash
# Splendor north-star training recipe (round 4) — ONE command, fresh start.
#
# TPU-native restatement of the reference's tuned 4-stage Splendor recipe
# (/root/reference/README.md:157-163) with the hyperparameters the
# committed pretrained_2players.pt was ACTUALLY trained with (read from the
# checkpoint's embedded args): nn_version 80 (tiny 142k-param 1d-mixer),
# numMCTSSims 800, cpuct 0.8, fpu 0.0593, dirichletAlpha 0.3,
# forced_playouts, universes 3, q_weight 0.837, temperature [1.25, 0.8],
# tempThreshold 6, updateThreshold 0.6.
#
# Our mapping: MixerNetV1 64x4 (367k params, the V80 analog; bf16,
# MXU-shaped), 2048 lockstep self-play lanes, staged sims 100->200->400->800
# with the reference's staged lr and q-weight, PCR (prob 0.25, ratio 5)
# exactly as the reference runs it, --dyn + --pcr-merged so the per-move
# program stays small at 800 sims (docs/tpu_limits.md).
#
# Usage: bash scripts/splendor_recipe_r4.sh <ckpt_dir> [stage4_iters]
set -euo pipefail
CKPT=${1:?usage: splendor_recipe_r4.sh <ckpt_dir> [stage4_iters]}
S4_ITERS=${2:-20}
LOG=${CKPT}.log
mkdir -p "$(dirname "$CKPT")"

COMMON=(splendor -C "$CKPT"
        -c 0.8 -f 0.06 -d 0.3 -u 3
        -t 1.25 0.8 1.1 -T -6
        -V 1 --channels 64 --depth 4
        -P 2048 -e 2048 -b 512 -p 2
        --updateThreshold 0.6 --arenaCompare 100 -s 50
        --ratio-fullMCTS 5 --prob-fullMCTS 0.25
        --pcr-merged --seed 7)
# NOTE round-4 probes (runs/probe_splendor_r4*.log): the dyn path survives
# ONLY at sims=100 at this batch (faults at 200/400/800 — arena width, not
# program size, crosses a kernel limit).  So stage 1 adds --dyn; stages
# 2-4 run the scan path, which the Coach auto-chunks to 1 move/program
# beyond safe_scan_sims (games/splendor.py:550, docs/tpu_limits.md), and
# whose gates auto-route to the host move loop.

resume_dir() {  # newest accepted net if any, else last temp checkpoint
    if [ -d "$CKPT/best" ]; then echo "$CKPT/best"; else echo "$CKPT/temp"; fi
}

run_stage() {  # run_stage <iters> <sims> <q> <lr> <history> <extra...>
    local iters=$1 sims=$2 q=$3 lr=$4 hist=$5; shift 5
    echo "=== stage: iters=$iters sims=$sims q=$q lr=$lr hist=$hist $* ===" \
        >> "$LOG"
    python -m alphazero_tpu.cli.main "${COMMON[@]}" \
        -n "$iters" -m "$sims" -q "$q" -l "$lr" -i "$hist" "$@" >> "$LOG" 2>&1
}

# each stage runs <iters> MORE iterations, resuming the same checkpoint dir;
# -i staging (example-history window 2/4/8/10) is the reference's own
# stage sequence (README.md:157-163).  Iteration counts are wall-clock
# budgeted for the round (the reference's own stages are 200-1500 episodes
# per iteration; ours are 2048, so fewer iterations see as many games).
# stage 1: -m 100 -q 0.  -l 0.003  -i 2   (dyn path, probed safe at 100)
run_stage 4 100 0.0 0.003 2 --dyn
# stage 2: -m 200 -q 0.5 -l 0.001  -i 4
run_stage 5 200 0.5 0.001 4 -L "$(resume_dir)"
# stage 3: -m 400 -q 0.837 -l 0.0003 -i 8 -F
# NOTE: the README's staged schedule is q 0.5 -> 1.0 (README.md:157-163);
# stages 3-4 here use q=0.837 instead — the FINAL q_weight embedded in the
# committed pretrained_2players.pt's args, i.e. what that checkpoint was
# actually trained with, deviating deliberately from the README prose.
run_stage 5 400 0.837 0.0003 8 -F -L "$(resume_dir)"
# stage 4: -m 800 -q 0.837 -l 0.0003 -i 10 -F (optional, time permitting)
if [ "$S4_ITERS" -gt 0 ]; then
    run_stage "$S4_ITERS" 800 0.837 0.0003 10 -F -L "$(resume_dir)"
fi
echo "=== recipe complete ===" >> "$LOG"
