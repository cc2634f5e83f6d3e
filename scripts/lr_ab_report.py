#!/usr/bin/env python
"""A/B report over two training runs' metrics.jsonl (VERDICT r2 next #4).

Compares the gate-accept ratchet, losses, and value-head health between
two runs (e.g. per-iteration OneCycle restart vs cross-iteration annealed
peak LR), in thirds of the run so late-training behavior — where the
round-2 plateau lived — is visible separately.

    python scripts/lr_ab_report.py runs/santorini_r3a runs/santorini_r3b \
        --labels restart anneal --out artifacts/strength/lr_ab.json
"""
import argparse
import json
import os
import sys


def load(run_dir):
    rows = []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            rows.append(json.loads(line))
    return rows


def summarize(rows):
    n = len(rows)
    thirds = [rows[: n // 3], rows[n // 3: 2 * n // 3], rows[2 * n // 3:]]
    out = dict(iterations=n,
               accepts=sum(r["gate"]["accepted"] for r in rows),
               accept_pattern="".join(
                   "A" if r["gate"]["accepted"] else "." for r in rows))
    for i, part in enumerate(thirds, 1):
        dec = [r for r in part if r["gate"]["nwins"] + r["gate"]["pwins"]]
        out[f"third{i}"] = dict(
            accepts=sum(r["gate"]["accepted"] for r in part),
            iters=len(part),
            mean_gate_winrate=round(sum(
                r["gate"]["nwins"] / (r["gate"]["nwins"] + r["gate"]["pwins"])
                for r in dec) / max(len(dec), 1), 4),
            mean_val_loss=round(sum(
                r["train"].get("val_loss", float("nan")) for r in part)
                / max(len(part), 1), 4),
            mean_value_corr=round(sum(
                r["train"].get("value_corr", float("nan")) for r in part)
                / max(len(part), 1), 4),
        )
    last = rows[-1]["train"]
    out["final"] = dict(loss=round(last["loss"], 4),
                        val_loss=round(last.get("val_loss", float("nan")), 4),
                        value_corr=round(last.get("value_corr",
                                                  float("nan")), 4),
                        lr_peak=last.get("lr_peak"))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_a")
    p.add_argument("run_b")
    p.add_argument("--labels", nargs=2, default=["A", "B"])
    p.add_argument("--out", default=None)
    args = p.parse_args()

    report = {args.labels[0]: summarize(load(args.run_a)),
              args.labels[1]: summarize(load(args.run_b))}
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
