#!/usr/bin/env bash
# Round-5 CPU match queue: strength anchors, run ONLY after the chip queue
# drains (CPU work concurrent with TPU training stalls the tunnel client —
# docs/tpu_limits.md round-5 addendum 2).  Ordered by evidence value; each
# step appends its JSONL row on completion so a truncated evening still
# lands the earlier anchors.
set -u
cd /root/repo
M=runs/matches_queue_r5.log
: > "$M"
log() { echo "[$(date +%H:%M:%S)] $*" >> "$M"; }

log "waiting for chip queue"
while ! grep -q "CHIP QUEUE DONE" runs/chip_queue_r5.log 2>/dev/null; do
    sleep 120
done

# (the splendor 100-sims headline row runs MANUALLY right after the
# recipe stops — see runs/matches_queue_r5.log / ref_match.jsonl)

# 2. Akropolis vs the Undefeated bot (reference ~75% anchor)
log "akropolis vs undefeated start"
timeout 5400 python -m alphazero_tpu.cli.pit akropolis \
    artifacts/strength/ckpts/akropolis_r5_best undefeated \
    -n 32 -m 100 --seed 7 --cpu \
    --out artifacts/strength/akropolis_vs_undef.jsonl >> "$M" 2>&1
log "akropolis rc=$?"

# 3. Abalone second anchor
log "abalone ref_match start"
timeout 5400 python -m alphazero_tpu.cli.ref_match \
    artifacts/strength/ckpts/abalone_r5_best --game abalone \
    -n 16 -m 100 --ref-sims 100 --seed 13 \
    --out artifacts/strength/ref_match.jsonl >> "$M" 2>&1
log "abalone rc=$?"

# 4. Splendor at 800 sims (the reference checkpoint's native budget)
log "splendor ref_match 800 sims start"
timeout 10800 python -m alphazero_tpu.cli.ref_match \
    artifacts/strength/ckpts/splendor_r5_best --game splendor \
    -n 20 -m 800 --ref-sims 800 --seed 43 \
    --out artifacts/strength/ref_match.jsonl >> "$M" 2>&1
log "splendor800 rc=$?"
log "MATCH QUEUE DONE"
