"""Compressed example codec for the host<->device boundary.

The reference streams examples between threads of one process, so its only
"codec" is zlib on the replay deque (/root/reference/Coach.py:84,
main.py:155).  Here the self-play device and the host replay buffer sit on
opposite sides of a PCIe-or-slower link (under the axon tunnel, device->host
measured ~7 MB/s), so the boundary format matters more than CPU-side zlib
ever did:

- pi is a ROOT VISIT distribution: one MCTS simulation increments exactly one
  root edge, so at most ``num_sims`` entries are nonzero out of A (4056 for
  akropolis).  Store top-K (K = min(A, num_sims)) values+indices instead of
  the dense row: ~20x smaller, lossless.
- valids is a bool mask: bit-pack 8 actions per byte (lossless).
- z/q/pi values travel as float16 (they are win/loss vectors and visit
  fractions; f16 resolution 2^-11 exceeds the 1/num_sims quantization of the
  data itself).
- only full-search rows can become examples (playout-cap randomization,
  reference Coach.py:65-69): exactly n_full lanes per move slot, so the row
  budget T*n_full is static and the kept-row gather compiles.

Both directions use the same format: the actor encodes on device before the
single device->host transfer, the trainer uploads the encoded form and
decodes on device inside the jitted train step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class EncodedExamples:
    """Flat (N, ...) compressed example rows (device or host arrays)."""
    state: jax.Array      # (N, *state_shape) int8
    pi_vals: jax.Array    # (N, Kpi) float16 — nonzero policy values
    pi_idx: jax.Array     # (N, Kpi) int32 — action indices (0-padded)
    valids: jax.Array     # (N, ceil(A/8)) uint8 — bit-packed mask
    z: jax.Array          # (N, P) float16
    q: jax.Array          # (N, P) float16
    weight: jax.Array     # (N,) float16 — 0 marks padding/unusable rows
    lane: jax.Array       # (N,) int32 — originating self-play lane (game
    #                       slot); whole episodes share a lane, so holding
    #                       out rows by lane id reserves entire episodes
    #                       for validation (ReplayBuffer.holdout_lane_mod)


def pi_budget(num_actions: int, num_sims: int) -> int:
    """Max nonzero entries of a root visit policy from ``num_sims`` sims."""
    return int(min(num_actions, max(num_sims, 1)))


# --- bool mask <-> packed bytes (big-endian bit order = np.packbits) --------

def pack_bool(mask):
    """(..., A) bool -> (..., ceil(A/8)) uint8, jnp, np.packbits bit order."""
    A = mask.shape[-1]
    pad = (-A) % 8
    if pad:
        mask = jnp.concatenate(
            [mask, jnp.zeros(mask.shape[:-1] + (pad,), mask.dtype)], -1)
    m = mask.reshape(mask.shape[:-1] + (-1, 8)).astype(jnp.uint8)
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)   # MSB first
    return (m << shifts).sum(-1).astype(jnp.uint8)


def unpack_bool(packed, num_actions: int):
    """(..., ceil(A/8)) uint8 -> (..., A) bool, jnp."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., :, None] >> shifts) & 1
    flat = bits.reshape(packed.shape[:-1] + (-1,))
    return flat[..., :num_actions].astype(bool)


def unpack_bool_np(packed: np.ndarray, num_actions: int) -> np.ndarray:
    return np.unpackbits(packed, axis=-1)[..., :num_actions].astype(bool)


def pack_bool_np(mask: np.ndarray) -> np.ndarray:
    return np.packbits(mask, axis=-1)


# --- sparse pi <-> dense -----------------------------------------------------

def sparsify_pi(pi, k: int):
    """(..., A) -> ((..., k) f16 vals, (..., k) i32 idx) via top-k."""
    vals, idx = jax.lax.top_k(pi, k)
    return vals.astype(jnp.float16), idx.astype(jnp.int32)


def densify_pi(pi_vals, pi_idx, num_actions: int):
    """Inverse of sparsify_pi, float32 output, renormalized.  Uses
    scatter-ADD so 0-padded duplicate indices are harmless."""
    vals = pi_vals.astype(jnp.float32)
    dense = jnp.zeros(pi_vals.shape[:-1] + (num_actions,), jnp.float32)
    dense = dense.at[
        tuple(jnp.indices(pi_idx.shape)[:-1]) + (pi_idx,)].add(vals)
    s = dense.sum(-1, keepdims=True)
    return dense / jnp.maximum(s, 1e-30)


def densify_pi_np(pi_vals: np.ndarray, pi_idx: np.ndarray,
                  num_actions: int) -> np.ndarray:
    dense = np.zeros(pi_vals.shape[:-1] + (num_actions,), np.float32)
    np.put_along_axis(dense, pi_idx.astype(np.int64),
                      pi_vals.astype(np.float32), axis=-1)
    s = dense.sum(-1, keepdims=True)
    return dense / np.maximum(s, 1e-30)


def decode_batch(enc: dict, num_actions: int) -> dict:
    """Device-side decode of an uploaded encoded batch into the dense dict
    the loss functions consume.  Runs inside jit."""
    return dict(
        state=enc["state"],
        pi=densify_pi(enc["pi_vals"], enc["pi_idx"], num_actions),
        valids=unpack_bool(enc["valids"], num_actions),
        z=enc["z"].astype(jnp.float32),
        q=enc["q"].astype(jnp.float32),
    )


# --- actor batch -> encoded rows (device) ------------------------------------

@functools.partial(jax.jit, static_argnames=("num_rows", "k_pi"))
def encode_examples(batch, num_rows: int, k_pi: int) -> EncodedExamples:
    """Compact a (T, B, ...) SelfPlayBatch into ``num_rows`` flat encoded
    rows (weight-descending; rows beyond the number of usable examples are
    0-weight padding).  num_rows should be T * n_full_lanes — the static
    upper bound on weight>0 rows under the lane-split PCR."""
    B = batch.weight.shape[1]
    w = batch.weight.reshape(-1)
    keep = jnp.flatnonzero(w > 0, size=num_rows, fill_value=0)
    # fill slots alias row 0 (which may itself be a usable example): zero
    # their weight so the host drops them instead of double-inserting row 0
    real = jnp.arange(num_rows) < jnp.sum(w > 0)
    flat = lambda x: x.reshape((-1,) + x.shape[2:])[keep]
    pi_vals, pi_idx = sparsify_pi(flat(batch.pi), k_pi)
    return EncodedExamples(
        state=flat(batch.state).astype(jnp.int8),
        pi_vals=pi_vals,
        pi_idx=pi_idx,
        valids=pack_bool(flat(batch.valids)),
        z=flat(batch.z).astype(jnp.float16),
        q=flat(batch.q).astype(jnp.float16),
        weight=jnp.where(real, w[keep], 0.0).astype(jnp.float16),
        lane=(keep % B).astype(jnp.int32),  # (T, B) row-major flatten
    )
