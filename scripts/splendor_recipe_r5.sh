#!/usr/bin/env bash
# Splendor north-star training recipe (round 5) — ONE command, fresh start,
# ALL FOUR stages (the round-4 run executed stages 1-3 only; VERDICT r4
# task 1 is to run stage 4 for real).
#
# TPU-native restatement of the reference's tuned 4-stage Splendor scenario
# (/root/reference/README.md:157-163) with the hyperparameters the committed
# pretrained_2players.pt was ACTUALLY trained with (read from the
# checkpoint's embedded args — note stages 3-4 q=0.837 is the checkpoint's
# final q_weight, deviating from the README's 0.5/1.0 prose): nn_version 80
# analog MixerNetV1 64x4, cpuct 0.8, fpu 0.06, dirichlet 0.3, universes 3,
# temp 1.25->0.8 at move 6, staged sims 100->200->400->800, staged history
# windows 2/4/8/10, staged lr 3e-3 -> 3e-4.
#
# Round-5 changes vs scripts/splendor_recipe_r4.sh:
# - gates run the framework's own operating point: 300 games @ 0.55
#   (config.py rationale — same accept bar as the reference's 30 @ 0.60
#   with ~±3% CI instead of ±9%; the r4 run's 100 @ 0.60 rejected 6 of the
#   last 8 candidates at 49-55% winrates, exactly the noise band)
# - stage-4 self-play shape comes from the round-5 width probes
#   (scripts/probe_stage4_r5.sh -> docs/tpu_limits.md): S4_MODE env picks
#   dyn-at-smaller-B vs the chunk=1 scan fallback
# - VLW env (default 0.25) feeds --value-loss-weight, set from the
#   round-5 value-head study (artifacts/strength/value_ab_r5.jsonl)
#
# Usage: bash scripts/splendor_recipe_r5.sh <ckpt_dir> [stage4_iters]
#   env: S4_MODE=dyn1024|dyn512|scan (default scan)  VLW=0.25
set -euo pipefail
CKPT=${1:?usage: splendor_recipe_r5.sh <ckpt_dir> [stage4_iters]}
S4_ITERS=${2:-20}
S4_MODE=${S4_MODE:-scan}
VLW=${VLW:-0.25}
LOG=${CKPT}.log
mkdir -p "$(dirname "$CKPT")"

COMMON=(splendor -C "$CKPT"
        -c 0.8 -f 0.06 -d 0.3 -u 3
        -t 1.25 0.8 1.1 -T -6
        -V 1 --channels 64 --depth 4
        -e 2048 -b 512 -p 2
        --updateThreshold 0.55 --arenaCompare 300 -s 50
        --ratio-fullMCTS 5 --prob-fullMCTS 0.25
        --value-loss-weight "$VLW"
        --pcr-merged --seed 11)

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

case "$S4_MODE" in          # stage-4 self-play path (round-5 width probes)
    dyn1024) S4_FLAGS=(-P 1024 --dyn) ;;
    dyn512)  S4_FLAGS=(-P 512 --dyn) ;;
    scan)    S4_FLAGS=(-P 2048) ;;   # Coach auto-chunks to 1 move/program
    *) echo "bad S4_MODE=$S4_MODE" >&2; exit 2 ;;
esac

# stage 1: -m 100 -q 0.  -l 0.003  -i 2   (dyn path, probed safe at 100)
run_stage 4 100 0.0 0.003 2 -P 2048 --dyn
# stage 2: -m 200 -q 0.5 -l 0.001  -i 4
run_stage 5 200 0.5 0.001 4 -P 2048 -L "$(resume_dir)"
# stage 3: -m 400 -q 0.837 -l 0.0003 -i 8 -F
run_stage 5 400 0.837 0.0003 8 -F -P 2048 -L "$(resume_dir)"
# stage 4: -m 800 -q 0.837 -l 0.0003 -i 10 -F  (the strength-earning stage)
if [ "$S4_ITERS" -gt 0 ]; then
    run_stage "$S4_ITERS" 800 0.837 0.0003 10 -F "${S4_FLAGS[@]}" \
        -L "$(resume_dir)"
fi
echo "=== recipe complete ===" >> "$LOG"
