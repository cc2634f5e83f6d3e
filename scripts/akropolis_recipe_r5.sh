#!/usr/bin/env bash
# Akropolis retrain (round 5) — the run specified verbatim by the round-4
# post-mortem (STRENGTH_r04.md §2) after the 0-32 loss to the reference's
# "Undefeated Strategy" bot (/root/reference/akropolis/AkropolisPlayers.py:
# 350-497; ~75% anchor README.md:80-86).  The r3 run used NONE of the
# machinery built for this game; this one uses all of it:
#   -V 2   FiLMConvNetV2 — global-context FiLM conditioning, the analog of
#          the reference's Akropolis V50 family (AkropolisNNet.py:74-170)
#   -u 5   PC-PIMC determinized chance during search (tile draws visible;
#          reference default universes=8, MCTS.py:14)
#   -F     forced playouts + policy-target pruning at the root
#   -d -1  auto dirichlet alpha (10/n_valid advisory)
#   42 iterations (r3 stopped at 17, half a run), 300-game 0.55 gates
# Tracks corr(v,z) against the r3 0.46 plateau (metrics.jsonl per iter).
#
# Usage: bash scripts/akropolis_recipe_r5.sh <ckpt_dir> [iters]
set -euo pipefail
CKPT=${1:?usage: akropolis_recipe_r5.sh <ckpt_dir> [iters]}
ITERS=${2:-42}
LOG=${CKPT}.log
mkdir -p "$(dirname "$CKPT")"

python -m alphazero_tpu.cli.main akropolis -C "$CKPT" \
    -n "$ITERS" -m 100 -u 5 -F -d -1 \
    -V 2 --channels 128 --depth 6 \
    -P 2048 -e 2048 -b 512 -p 4 -i 5 \
    -l 0.002 -q 0.5 \
    --updateThreshold 0.55 --arenaCompare 300 -s 25 \
    --seed 5 >> "$LOG" 2>&1
echo "=== akropolis retrain complete ===" >> "$LOG"
