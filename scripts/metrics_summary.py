#!/usr/bin/env python
"""Summarize a run's metrics.jsonl: per-iteration losses, gate results,
self-play throughput — the data behind STRENGTH_r02.md tables."""
import json
import sys


def main(path):
    rows = [json.loads(l) for l in open(path)]
    acc = 0
    print(f"{'it':>4} {'sp_s':>6} {'sims/s':>8} {'games/s':>8} "
          f"{'loss':>6} {'pi':>6} {'v':>6} {'val':>6} {'corr':>5}  gate")
    for d in rows:
        s, t, g = d.get("selfplay"), d["train"], d["gate"]
        acc += g["accepted"]
        print(f"{d['iteration']:>4} "
              f"{s['seconds']:>6.1f} {int(s['sims_per_s']):>8} "
              f"{s.get('games_per_s', 0):>8.1f} "
              if s else f"{d['iteration']:>4} {'—':>6} {'—':>8} {'—':>8} ",
              end="")
        print(f"{t['loss']:>6.3f} {t['loss_pi']:>6.3f} {t['loss_v']:>6.3f} "
              f"{t.get('val_loss', float('nan')):>6.3f} "
              f"{t.get('value_corr', float('nan')):>5.2f}  "
              f"{g['nwins']}-{g['pwins']}-{g['draws']} "
              f"{'ACC' if g['accepted'] else 'rej'}")
    n = len(rows)
    print(f"\n{n} iterations, {acc} accepted ({100 * acc / max(n, 1):.0f}%)")


if __name__ == "__main__":
    main(sys.argv[1])
