"""Checkpointing with embedded config + architecture transfer.

Reference behavior preserved (/root/reference/GenericNNetWrapper.py:192-277,
Coach.py:217-262, main.py:51-83):
- every checkpoint embeds the full config (the reference stores all argparse
  flags in the .pt dict)
- best / temp / iter_NNNN naming
- replay buffer persisted alongside
- cross-architecture warm start: on parameter-tree mismatch, copy overlapping
  slices by name with per-dimension cropping (knowledge transfer)
- settings diff on resume (config.diff_configs)
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from alphazero_tpu.config import Config
from alphazero_tpu.models import transfer_params


def save_checkpoint(path: str, params, cfg: Config, *,
                    meta: Optional[dict] = None):
    """Optimizer state is intentionally not checkpointed: the training loop
    rebuilds AdamW+OneCycle from scratch every iteration (reference
    GenericNNetWrapper.py:49-51), so there is no consumer for it."""
    # multi-host: params are replicated, so only process 0 writes — the
    # others would race on the same files in shared storage
    if jax.process_index() != 0:
        return
    os.makedirs(path, exist_ok=True)

    # atomic per-file writes (tmp + rename): a SIGTERM/crash mid-save must
    # never leave a truncated params.msgpack that a later load chokes on
    def _write(name, data, mode):
        tmp = os.path.join(path, name + ".tmp")
        with open(tmp, mode) as f:
            f.write(data)
        os.replace(tmp, os.path.join(path, name))

    blob = serialization.to_bytes(jax.device_get(params))
    _write("params.msgpack", blob, "wb")
    _write("config.json", cfg.to_json(), "w")
    # content hash in meta so every strength artifact row can name the exact
    # params it measured — a wiped scratch volume can no longer orphan
    # committed evidence (see artifacts/strength/*)
    meta = dict(meta or {})
    meta["params_sha256"] = hashlib.sha256(blob).hexdigest()[:16]
    _write("meta.json", json.dumps(meta, indent=2), "w")


def load_config(path: str) -> Config:
    with open(os.path.join(path, "config.json")) as f:
        return Config.from_json(f.read())


def load_checkpoint(path: str, params_template) -> Tuple[Any, Config, dict,
                                                         bool]:
    """Load params into the given template.

    Returns (params, embedded_config, meta, transferred) where transferred is
    True when the stored tree did not match and knowledge transfer (shape-
    cropped copy) was applied — the caller should then retrain from examples
    before self-play, like the reference's requestKnowledgeTransfer
    (GenericNNetWrapper.py:271-277, Coach.py:33,161).
    """
    cfg = load_config(path)
    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        blob = f.read()
    try:
        params = serialization.from_bytes(params_template, blob)
        # from_bytes restores without shape validation — verify leaf shapes
        for a, b in zip(jax.tree.leaves(params_template),
                        jax.tree.leaves(params)):
            if a.shape != b.shape:
                raise ValueError("shape mismatch")
        return params, cfg, meta, False
    except (ValueError, KeyError):
        # architecture mismatch -> knowledge transfer by name + crop
        raw = serialization.msgpack_restore(blob)
        params, copied = transfer_params(raw, params_template)
        return params, cfg, meta, True


def checkpoint_name(iteration: int) -> str:
    return f"iter_{iteration:04d}"


def params_hash(path: str) -> str:
    """Content hash of a checkpoint's params, preferring the one stamped at
    save time (meta.json); falls back to hashing params.msgpack directly for
    pre-stamp checkpoints.  Used to tie strength-artifact JSONL rows to the
    exact committed params they measured."""
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            h = json.load(f).get("params_sha256")
        if h:
            return h
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]
