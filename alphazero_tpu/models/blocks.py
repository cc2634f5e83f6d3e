"""Reusable flax building blocks for policy/value networks.

Behavioral spec: the reference's torch blocks (LinearNormActivation /
InvertedResidual trunks, e.g. /root/reference/santorini/SantoriniNNet.py:99-220
and splendor/SplendorNNet.py:149-233).  TPU-first choices instead of a
translation: bfloat16 compute with float32 params, GroupNorm instead of
BatchNorm (no mutable running stats → pure functional train/eval; fuses well
under XLA), channel counts sized for MXU tiling.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class DenseNormAct(nn.Module):
    features: int
    dtype: Dtype = jnp.bfloat16
    act: Callable = nn.silu
    use_norm: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.features, dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        if self.use_norm:
            x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        return self.act(x)


class ConvNormAct(nn.Module):
    features: int
    kernel: int = 3
    dtype: Dtype = jnp.bfloat16
    act: Callable = nn.silu

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.GroupNorm(num_groups=min(32, self.features),
                         dtype=self.dtype, param_dtype=jnp.float32)(x)
        return self.act(x)


class ResBlock2D(nn.Module):
    """Pre-activation residual conv block."""
    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = ConvNormAct(self.features, 3, self.dtype)(x)
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32)(h)
        h = nn.GroupNorm(num_groups=min(32, self.features),
                         dtype=self.dtype, param_dtype=jnp.float32)(h)
        return nn.silu(x + h)


class SEBlock(nn.Module):
    """Squeeze-and-excitation (reference uses SE inside InvertedResidual,
    splendor/SplendorNNet.py:189-204)."""
    features: int
    reduction: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # x: (..., H, W, C) or (..., T, C)
        axes = tuple(range(x.ndim - 3, x.ndim - 1)) if x.ndim >= 3 else (-2,)
        s = jnp.mean(x, axis=axes, keepdims=True)
        s = nn.Dense(self.features // self.reduction, dtype=self.dtype,
                     param_dtype=jnp.float32)(s)
        s = nn.silu(s)
        s = nn.Dense(self.features, dtype=self.dtype,
                     param_dtype=jnp.float32)(s)
        return x * nn.sigmoid(s)


class InvertedResidual1D(nn.Module):
    """MobileNetV3-style token-mixing block over a (T, C) board encoding —
    the reference's InvertedResidual1d (splendor/SplendorNNet.py:189-233)
    re-expressed with LayerNorm + dense mixing (matmuls on the MXU instead of
    grouped 1D convs, which XLA tiles poorly at these sizes)."""
    features: int
    expand: int = 4
    use_se: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        h = nn.Dense(self.features * self.expand, dtype=self.dtype,
                     param_dtype=jnp.float32)(h)
        h = nn.silu(h)
        if self.use_se:
            h = SEBlock(self.features * self.expand, dtype=self.dtype)(h)
        h = nn.Dense(self.features, dtype=self.dtype,
                     param_dtype=jnp.float32)(h)
        return x + h


class FiLMBlock(nn.Module):
    """Feature-wise linear modulation of conv features by a global context
    vector (reference: FiLM-conditioned MobileNet for Akropolis,
    akropolis/AkropolisNNet.py:74-170)."""
    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, ctx):
        # x: (B, H, W, C); ctx: (B, K)
        h = ConvNormAct(self.features, 3, self.dtype)(x)
        gb = nn.Dense(2 * self.features, dtype=self.dtype,
                      param_dtype=jnp.float32)(ctx)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        h = h * (1.0 + gamma[:, None, None, :]) + beta[:, None, None, :]
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32)(h)
        h = nn.GroupNorm(num_groups=min(32, self.features),
                         dtype=self.dtype, param_dtype=jnp.float32)(h)
        return nn.silu(x + h)


class TransformerBlock(nn.Module):
    """Pre-norm micro-transformer block over entity tokens (reference
    micro-Transformer trunk, splendor/SplendorNNet.py:333-354)."""
    features: int
    heads: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype,
            param_dtype=jnp.float32)(h, h)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        h = nn.Dense(self.features * 4, dtype=self.dtype,
                     param_dtype=jnp.float32)(h)
        h = nn.silu(h)
        h = nn.Dense(self.features, dtype=self.dtype,
                     param_dtype=jnp.float32)(h)
        return x + h


class TokenMixer(nn.Module):
    """MLP-Mixer style token mixing across board rows (reference entity-token
    trunk, splendor/SplendorNNet.py:206-233)."""
    tokens: int
    hidden: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        # x: (B, T, C)
        h = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        h = jnp.swapaxes(h, -1, -2)
        h = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.silu(h)
        h = nn.Dense(self.tokens, dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = jnp.swapaxes(h, -1, -2)
        return x + h
