"""Policy/value network architectures.

Behavioral contract (identical to the reference nets, e.g.
/root/reference/santorini/SantoriniNNet.py and splendor/SplendorNNet.py:385-440):
  inputs  : float observation (B, *obs_shape), bool valid-action mask (B, A)
  outputs : (log_pi, v) where log_pi = log_softmax over logits with invalid
            actions masked to -1e8 INSIDE the network (so normalization
            matches training targets), v = tanh head with one output per
            player.

Architectures are versioned behind the factory in models/__init__.py,
mirroring the reference's numbered per-game versions.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from alphazero_tpu.models.blocks import (
    ConvNormAct, DenseNormAct, FiLMBlock, InvertedResidual1D, ResBlock2D,
    TokenMixer, TransformerBlock)

MASK_VALUE = -1e8  # reference: torch.where(valids, pi, -1e8)


def masked_heads(trunk_feats, valids, num_actions, num_players, dtype):
    """Shared policy/value head: masked log-softmax + tanh value."""
    h = DenseNormAct(256, dtype=dtype)(trunk_feats)
    logits = nn.Dense(num_actions, dtype=jnp.float32,
                      param_dtype=jnp.float32)(h.astype(jnp.float32))
    logits = jnp.where(valids, logits, MASK_VALUE)
    log_pi = nn.log_softmax(logits, axis=-1)

    hv = DenseNormAct(128, dtype=dtype)(trunk_feats)
    v = nn.Dense(num_players, dtype=jnp.float32,
                 param_dtype=jnp.float32)(hv.astype(jnp.float32))
    return log_pi, jnp.tanh(v)


class ConvNetV1(nn.Module):
    """Residual conv trunk for plane-shaped boards (Santorini/Abalone/
    Akropolis family; reference ResNet versions e.g. SantoriniNNet.py:99-220)."""
    num_actions: int
    num_players: int
    channels: int = 128
    depth: int = 6
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, obs, valids, train: bool = False):
        x = obs.astype(self.dtype)
        x = ConvNormAct(self.channels, 3, self.dtype)(x)
        for _ in range(self.depth):
            x = ResBlock2D(self.channels, self.dtype)(x)
        # global board embedding: mean + max pooling, concatenated
        feats = jnp.concatenate(
            [jnp.mean(x, axis=(-3, -2)), jnp.max(x, axis=(-3, -2))], axis=-1)
        return masked_heads(feats, valids, self.num_actions,
                            self.num_players, self.dtype)


class MixerNetV1(nn.Module):
    """Token-mixing trunk for row-structured boards (Splendor/Azul/Minivilles
    family; reference MobileNetV3-1D / MLP-Mixer versions,
    splendor/SplendorNNet.py:206-330)."""
    num_actions: int
    num_players: int
    num_tokens: int
    channels: int = 128
    depth: int = 6
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, obs, valids, train: bool = False):
        # obs: (B, T, D) — rows become tokens
        x = obs.astype(self.dtype)
        x = nn.Dense(self.channels, dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        for _ in range(self.depth):
            x = TokenMixer(self.num_tokens, self.channels, self.dtype)(x)
            x = InvertedResidual1D(self.channels, dtype=self.dtype)(x)
        feats = jnp.concatenate(
            [jnp.mean(x, axis=-2), jnp.max(x, axis=-2)], axis=-1)
        return masked_heads(feats, valids, self.num_actions,
                            self.num_players, self.dtype)


class EntityNetV2(nn.Module):
    """Entity-token transformer for row-structured boards — the reference's
    V90-92 family (typed entity embeddings + micro-Transformer trunk,
    splendor/SplendorNNet.py:10-97,333-383).  Each board row becomes a token
    with a learned positional/type embedding; a small pre-norm transformer
    mixes entities; heads read the pooled sequence."""
    num_actions: int
    num_players: int
    num_tokens: int
    channels: int = 128
    depth: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, obs, valids, train: bool = False):
        x = obs.astype(self.dtype)                   # (B, T, D)
        x = nn.Dense(self.channels, dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        pos = self.param("entity_embed", nn.initializers.normal(0.02),
                         (self.num_tokens, self.channels), jnp.float32)
        x = x + pos.astype(self.dtype)[None]
        for _ in range(self.depth):
            x = TransformerBlock(self.channels, dtype=self.dtype)(x)
        feats = jnp.concatenate(
            [jnp.mean(x, axis=-2), jnp.max(x, axis=-2)], axis=-1)
        return masked_heads(feats, valids, self.num_actions,
                            self.num_players, self.dtype)


class FiLMConvNetV2(nn.Module):
    """FiLM-conditioned conv trunk for plane boards — the reference's
    Akropolis V50 family (global-context features modulating a MobileNet
    trunk, akropolis/AkropolisNNet.py:74-170,415-496).  The global context is
    the mean-pooled input (scalar planes included), so non-geometric state
    (deck, scores, stones) steers every conv block."""
    num_actions: int
    num_players: int
    channels: int = 128
    depth: int = 6
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, obs, valids, train: bool = False):
        x = obs.astype(self.dtype)
        ctx = jnp.mean(x, axis=(-3, -2))             # (B, C_in)
        ctx = DenseNormAct(self.channels, dtype=self.dtype)(ctx)
        x = ConvNormAct(self.channels, 3, self.dtype)(x)
        for _ in range(self.depth):
            x = FiLMBlock(self.channels, self.dtype)(x, ctx)
        feats = jnp.concatenate(
            [jnp.mean(x, axis=(-3, -2)), jnp.max(x, axis=(-3, -2)), ctx],
            axis=-1)
        return masked_heads(feats, valids, self.num_actions,
                            self.num_players, self.dtype)


class MLPNetV1(nn.Module):
    """Small dense net (fast baseline / tiny games)."""
    num_actions: int
    num_players: int
    channels: int = 256
    depth: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, obs, valids, train: bool = False):
        x = obs.reshape(obs.shape[0], -1).astype(self.dtype)
        for _ in range(self.depth):
            x = DenseNormAct(self.channels, dtype=self.dtype)(x)
        return masked_heads(x, valids, self.num_actions,
                            self.num_players, self.dtype)
