"""Versioned network factory + knowledge transfer.

Mirrors the reference's per-game numbered architectures behind one factory
(e.g. /root/reference/santorini/NNet.py + SantoriniNNet.py version switch) and
its cross-architecture warm start by shape-cropped parameter copy
(GenericNNetWrapper.load_network, /root/reference/GenericNNetWrapper.py:222-277).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.config import NetConfig
from alphazero_tpu.games.base import GameSpec
from alphazero_tpu.models.nets import (ConvNetV1, EntityNetV2, FiLMConvNetV2,
                                       MixerNetV1, MLPNetV1)


def make_net(spec: GameSpec, cfg: NetConfig):
    """Pick an architecture by version + observation rank (the reference's
    per-game numbered versions, e.g. Splendor V80/90, Akropolis V40/50):
      version 0: dense baseline
      version 1: residual conv (planes) / MLP-Mixer (rows)
      version 2: FiLM-conditioned conv (planes) / entity-token transformer
                 (rows)
    """
    dtype = jnp.dtype(cfg.dtype)
    kw = dict(num_actions=spec.num_actions, num_players=spec.num_players,
              channels=cfg.channels, depth=cfg.depth, dtype=dtype)
    if cfg.version == 0:
        return MLPNetV1(**kw)
    if len(spec.obs_shape) == 3:         # (H, W, C) plane boards
        return FiLMConvNetV2(**kw) if cfg.version >= 2 else ConvNetV1(**kw)
    if len(spec.obs_shape) == 2:         # (T, D) row boards
        if cfg.version >= 2:
            return EntityNetV2(num_tokens=spec.obs_shape[0], **kw)
        return MixerNetV1(num_tokens=spec.obs_shape[0], **kw)
    return MLPNetV1(**kw)


def init_params(net, spec: GameSpec, key) -> Any:
    obs = jnp.zeros((1, *spec.obs_shape), jnp.float32)
    valids = jnp.ones((1, spec.num_actions), bool)
    return net.init(key, obs, valids)


def make_eval_fn(net, params):
    """Closure matching search.mcts.EvalFn: returns (normalized prior, v)."""
    def eval_fn(obs, valids):
        log_pi, v = net.apply(params, obs, valids)
        return jnp.exp(log_pi), v
    return eval_fn


def param_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def transfer_params(old_params, new_params):
    """Knowledge transfer: copy overlapping parameter slices by name with
    per-dimension min-size cropping (1-4D), reference semantics from
    GenericNNetWrapper.py:222-277.  Parameters present only in the new net
    keep their fresh initialization."""
    old_flat = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_flatten_with_path(old_params)[0]}
    new_flat, treedef = jax.tree_util.tree_flatten_with_path(new_params)

    out = []
    copied = 0
    for k, new_v in new_flat:
        name = jax.tree_util.keystr(k)
        old_v = old_flat.get(name)
        if old_v is None or old_v.ndim != new_v.ndim:
            out.append(new_v)
            continue
        crop = tuple(slice(0, min(o, n))
                     for o, n in zip(old_v.shape, new_v.shape))
        merged = jnp.asarray(new_v).at[crop].set(
            jnp.asarray(old_v)[crop].astype(new_v.dtype))
        out.append(merged)
        copied += 1
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(new_params), out), copied


__all__ = ["make_net", "init_params", "make_eval_fn", "param_count",
           "transfer_params", "ConvNetV1", "MixerNetV1", "MLPNetV1"]
