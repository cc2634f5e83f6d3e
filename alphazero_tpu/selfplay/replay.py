"""Host-side replay buffer.

Replaces the reference's per-iteration zlib'd deques
(/root/reference/Coach.py:106,167-189, main.py:160-161 memory budget): a
preallocated numpy ring buffer of typed arrays.  int8 states + f16 policies
make zlib unnecessary (the reference's ~0.5 kB/example compressed becomes
~0.4 kB raw for Santorini).  The reference's "drop oldest iterations"
history (numItersHistory) maps to ring capacity = examples/iter * history.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


class ReplayBuffer:
    def __init__(self, capacity: int, state_shape, num_actions: int,
                 num_players: int):
        self.capacity = int(capacity)
        self.state = np.zeros((capacity, *state_shape), np.int8)
        self.pi = np.zeros((capacity, num_actions), np.float16)
        self.z = np.zeros((capacity, num_players), np.float16)
        self.q = np.zeros((capacity, num_players), np.float16)
        self.valids = np.zeros((capacity, num_actions), bool)
        self.size = 0
        self.head = 0
        self.total_added = 0

    def add_batch(self, batch) -> int:
        """Insert a SelfPlayBatch (device or host); weight==0 slots dropped."""
        w = np.asarray(batch.weight).reshape(-1)
        keep = np.flatnonzero(w > 0)
        if keep.size == 0:
            return 0
        flat = lambda x: np.asarray(x).reshape((-1,) + x.shape[2:])[keep]
        self._insert(flat(batch.state), flat(batch.pi), flat(batch.z),
                     flat(batch.q), flat(batch.valids))
        return keep.size

    def _insert(self, state, pi, z, q, valids):
        n = state.shape[0]
        idx = (self.head + np.arange(n)) % self.capacity
        self.state[idx] = state
        self.pi[idx] = pi
        self.z[idx] = z
        self.q[idx] = q
        self.valids[idx] = valids
        self.head = int((self.head + n) % self.capacity)
        self.size = int(min(self.size + n, self.capacity))
        self.total_added += int(n)

    def sample(self, rng: np.random.Generator, batch_size: int
               ) -> Dict[str, np.ndarray]:
        """Uniform sampling without replacement within a batch (reference
        GenericNNetWrapper.py:60)."""
        ids = rng.choice(self.size, size=batch_size,
                         replace=batch_size > self.size)
        return dict(
            state=self.state[ids],
            pi=self.pi[ids].astype(np.float32),
            z=self.z[ids].astype(np.float32),
            q=self.q[ids].astype(np.float32),
            valids=self.valids[ids],
        )

    # --- persistence (reference saveTrainExamples/loadTrainExamples,
    # Coach.py:220-262) ------------------------------------------------------

    def save(self, path: str, compress: bool = False):
        """Persist the buffer.  Written atomically (tmp + rename) so a crash
        mid-write never corrupts the previous snapshot; uncompressed by
        default because this now runs EVERY iteration (crash durability,
        reference Coach.py:167-184) and int8/f16 arrays compress poorly
        relative to the write-time cost."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp.npz"
        saver = np.savez_compressed if compress else np.savez
        saver(tmp, state=self.state[:self.size], pi=self.pi[:self.size],
              z=self.z[:self.size], q=self.q[:self.size],
              valids=self.valids[:self.size],
              meta=np.array([self.head, self.size, self.total_added]))
        os.replace(tmp, path if path.endswith(".npz") else path + ".npz")

    def load(self, path: str):
        d = np.load(path)
        n = min(int(d["meta"][1]), self.capacity)
        self.state[:n] = d["state"][:n]
        self.pi[:n] = d["pi"][:n]
        self.z[:n] = d["z"][:n]
        self.q[:n] = d["q"][:n]
        self.valids[:n] = d["valids"][:n]
        self.size = n
        self.head = n % self.capacity
        self.total_added = int(d["meta"][2])
