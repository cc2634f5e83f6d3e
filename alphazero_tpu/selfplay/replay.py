"""Host-side replay buffer, stored in the compressed example format.

Replaces the reference's per-iteration zlib'd deques
(/root/reference/Coach.py:106,167-189, main.py:160-161 memory budget): a
preallocated numpy ring buffer of typed arrays.  Rows are kept in the codec's
encoded form (sparse top-K policies, bit-packed valid masks, f16 scalars —
see selfplay/codec.py): ~20x smaller than dense f32 rows for wide action
spaces, and the encoded form is exactly what travels device->host after
self-play and host->device before training, so the buffer never densifies.
The reference's "drop oldest iterations" history (numItersHistory) maps to
ring capacity = examples/iter * history.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from alphazero_tpu.selfplay.codec import densify_pi_np, unpack_bool_np


class ReplayBuffer:
    def __init__(self, capacity: int, state_shape, num_actions: int,
                 num_players: int, pi_budget: int = 0):
        self.capacity = int(capacity)
        self.num_actions = int(num_actions)
        self.k_pi = int(pi_budget) or int(num_actions)
        self.state = np.zeros((capacity, *state_shape), np.int8)
        self.pi_vals = np.zeros((capacity, self.k_pi), np.float16)
        self.pi_idx = np.zeros((capacity, self.k_pi), np.int32)
        self.z = np.zeros((capacity, num_players), np.float16)
        self.q = np.zeros((capacity, num_players), np.float16)
        self.valids = np.zeros((capacity, -(-num_actions // 8)), np.uint8)
        self.size = 0
        self.head = 0
        self.total_added = 0

    def add_encoded(self, enc) -> int:
        """Insert EncodedExamples rows (host arrays); weight==0 padding rows
        are dropped.  Rows arrive weight-descending from encode_examples, so
        the kept prefix is contiguous."""
        w = np.asarray(enc.weight)
        n = int((w > 0).sum())
        if n == 0:
            return 0
        self._insert(np.asarray(enc.state)[:n],
                     np.asarray(enc.pi_vals)[:n],
                     np.asarray(enc.pi_idx)[:n],
                     np.asarray(enc.z)[:n],
                     np.asarray(enc.q)[:n],
                     np.asarray(enc.valids)[:n])
        return n

    def add_batch(self, batch) -> int:
        """Insert a dense (T, B, ...) SelfPlayBatch (host arrays); weight==0
        slots dropped.  Densely-collected path (tests, host actors)."""
        w = np.asarray(batch.weight).reshape(-1)
        keep = np.flatnonzero(w > 0)
        if keep.size == 0:
            return 0
        flat = lambda x: np.asarray(x).reshape((-1,) + x.shape[2:])[keep]
        pi = flat(batch.pi).astype(np.float32)
        k = min(self.k_pi, pi.shape[-1])
        idx = np.argpartition(-pi, k - 1, axis=-1)[:, :k].astype(np.int32)
        vals = np.take_along_axis(pi, idx, axis=-1).astype(np.float16)
        pad = self.k_pi - k
        if pad:
            idx = np.pad(idx, ((0, 0), (0, pad)))
            vals = np.pad(vals, ((0, 0), (0, pad)))
        self._insert(flat(batch.state), vals, idx,
                     flat(batch.z).astype(np.float16),
                     flat(batch.q).astype(np.float16),
                     np.packbits(flat(batch.valids), axis=-1))
        return keep.size

    def _insert(self, state, pi_vals, pi_idx, z, q, valids_packed):
        n = state.shape[0]
        idx = (self.head + np.arange(n)) % self.capacity
        self.state[idx] = state
        self.pi_vals[idx] = pi_vals
        self.pi_idx[idx] = pi_idx
        self.z[idx] = z
        self.q[idx] = q
        self.valids[idx] = valids_packed
        self.head = int((self.head + n) % self.capacity)
        self.size = int(min(self.size + n, self.capacity))
        self.total_added += int(n)

    def sample(self, rng: np.random.Generator, batch_size: int
               ) -> Dict[str, np.ndarray]:
        """Uniform sampling without replacement within a batch (reference
        GenericNNetWrapper.py:60).  Returns ENCODED rows — the trainer
        uploads them as-is and decodes on device (codec.decode_batch)."""
        ids = rng.choice(self.size, size=batch_size,
                         replace=batch_size > self.size)
        return dict(
            state=self.state[ids],
            pi_vals=self.pi_vals[ids],
            pi_idx=self.pi_idx[ids],
            z=self.z[ids],
            q=self.q[ids],
            valids=self.valids[ids],
        )

    def sample_dense(self, rng: np.random.Generator, batch_size: int
                     ) -> Dict[str, np.ndarray]:
        """sample() decoded to dense host arrays (offline tooling, eval)."""
        enc = self.sample(rng, batch_size)
        return self.decode(enc)

    def decode(self, enc: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        return dict(
            state=enc["state"],
            pi=densify_pi_np(enc["pi_vals"], enc["pi_idx"], self.num_actions),
            z=enc["z"].astype(np.float32),
            q=enc["q"].astype(np.float32),
            valids=unpack_bool_np(enc["valids"], self.num_actions),
        )

    def rows(self, ids: np.ndarray) -> Dict[str, np.ndarray]:
        """Dense decoded rows by index (offline tooling)."""
        return self.decode(dict(
            state=self.state[ids], pi_vals=self.pi_vals[ids],
            pi_idx=self.pi_idx[ids], z=self.z[ids], q=self.q[ids],
            valids=self.valids[ids]))

    # --- persistence (reference saveTrainExamples/loadTrainExamples,
    # Coach.py:220-262) ------------------------------------------------------

    def save(self, path: str, compress: bool = False):
        """Persist the buffer.  Written atomically (tmp + rename) so a crash
        mid-write never corrupts the previous snapshot; uncompressed by
        default because this now runs EVERY iteration (crash durability,
        reference Coach.py:167-184) and the encoded rows are already compact."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp.npz"
        saver = np.savez_compressed if compress else np.savez
        saver(tmp, state=self.state[:self.size],
              pi_vals=self.pi_vals[:self.size],
              pi_idx=self.pi_idx[:self.size],
              z=self.z[:self.size], q=self.q[:self.size],
              valids=self.valids[:self.size],
              meta=np.array([self.head, self.size, self.total_added,
                             self.k_pi]))
        os.replace(tmp, path if path.endswith(".npz") else path + ".npz")

    def load(self, path: str):
        d = np.load(path)
        n = min(int(d["meta"][1]), self.capacity)
        if "pi" in d:  # legacy dense-format snapshot
            pi = d["pi"][:n].astype(np.float32)
            k = min(self.k_pi, pi.shape[-1])
            idx = np.argpartition(-pi, k - 1, axis=-1)[:, :k].astype(np.int32)
            self.pi_idx[:n, :k] = idx
            self.pi_vals[:n, :k] = np.take_along_axis(pi, idx, axis=-1)
            self.valids[:n] = np.packbits(d["valids"][:n], axis=-1)
        else:
            k = min(self.k_pi, d["pi_vals"].shape[-1])
            self.pi_vals[:n, :k] = d["pi_vals"][:n, :k]
            self.pi_idx[:n, :k] = d["pi_idx"][:n, :k]
            self.valids[:n] = d["valids"][:n]
        self.state[:n] = d["state"][:n]
        self.z[:n] = d["z"][:n]
        self.q[:n] = d["q"][:n]
        self.size = n
        self.head = n % self.capacity
        self.total_added = int(d["meta"][2])
