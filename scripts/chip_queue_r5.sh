#!/usr/bin/env bash
# Round-5 chip queue: runs the remaining TPU jobs strictly SEQUENTIALLY
# (one tunnel client at a time, docs/tpu_limits.md) once the splendor
# recipe driver finishes.  Each step is its own process under timeout;
# a failed step logs and the queue continues.
set -u
cd /root/repo
Q=runs/chip_queue_r5.log
: > "$Q"
log() { echo "[$(date +%H:%M:%S)] $*" >> "$Q"; }

# 1. wait for the splendor recipe to finish (driver writes 'recipe complete')
log "waiting for splendor recipe"
while ! grep -q "recipe complete" runs/splendor_r5.log 2>/dev/null; do
    # also detect a dead driver (crash without the marker)
    if ! pgrep -x -f "bash scripts/splendor_recipe_r5.sh runs/splendor_r5 20" \
            > /dev/null 2>&1 && ! grep -q "recipe complete" runs/splendor_r5.log; then
        sleep 30
        if ! pgrep -x -f "bash scripts/splendor_recipe_r5.sh runs/splendor_r5 20" \
                > /dev/null 2>&1; then
            log "recipe driver gone without completion marker; proceeding"
            break
        fi
    fi
    sleep 120
done
log "splendor recipe done; snapshotting best"
python scripts/snapshot_ckpt.py runs/splendor_r5/best splendor_r5_best \
    >> "$Q" 2>&1 || log "snapshot failed (no best?)"

# 2. akropolis retrain (STRENGTH_r04 §2 spec)
log "akropolis retrain start"
timeout 10800 bash scripts/akropolis_recipe_r5.sh runs/akropolis_r5 42
log "akropolis retrain rc=$? (log runs/akropolis_r5.log)"
sleep 60   # post-kill tunnel settle (docs/tpu_limits.md §3)
python scripts/snapshot_ckpt.py runs/akropolis_r5/best akropolis_r5_best \
    >> "$Q" 2>&1 || true

# 3. abalone short train (second-anchor candidate)
log "abalone train start"
timeout 4500 python -m alphazero_tpu.cli.main abalone -C runs/abalone_r5 \
    -n 14 -m 100 -V 1 --channels 128 --depth 6 \
    -P 512 -e 512 -b 512 -p 4 -i 5 -l 0.002 -q 0.5 \
    --scan-moves 8 --updateThreshold 0.55 --arenaCompare 300 -s 25 \
    --seed 9 > runs/abalone_r5.log 2>&1
log "abalone train rc=$?"
sleep 60
python scripts/snapshot_ckpt.py runs/abalone_r5/best abalone_r5_best \
    >> "$Q" 2>&1 || true

# 4. studies closure: missing semantics rows, on device
log "semantics studies start"
timeout 3600 python scripts/search_semantics_study.py \
    --ckpt artifacts/strength/ckpts/santorini_r3a_best \
    --games 256 --caps 24 \
    --out artifacts/strength/studies.jsonl >> "$Q" 2>&1
log "semantics cap24 rc=$?"
sleep 30
timeout 2400 python scripts/search_semantics_study.py \
    --skip-santorini --games 256 --caps 8 \
    --out artifacts/strength/studies.jsonl >> "$Q" 2>&1
log "semantics splendor cap8 rc=$?"
sleep 30

# 5. bench validation (staged-dyn lever + fixed MFU model)
log "bench start"
timeout 3600 python bench.py > runs/bench_r5_validate.out 2>&1
log "bench rc=$? -> runs/bench_r5_validate.out"
log "CHIP QUEUE DONE"
