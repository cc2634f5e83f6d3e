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
                 num_players: int, pi_budget: int = 0,
                 holdout_lane_mod: int = 0, holdout_capacity: int = 16384):
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
        # true held-out split: self-play lanes with lane % mod == 0 route to
        # a separate validation ring and are NEVER sampled for training.  A
        # lane's episodes live entirely in one split, so this reserves whole
        # episodes (the reference evaluates on a held-out examples file,
        # GenericNNetWrapper.py:159-177 + Coach.__main__ [::8] test split)
        self.holdout_lane_mod = int(holdout_lane_mod)
        self.val = ReplayBuffer(holdout_capacity, state_shape, num_actions,
                                num_players, pi_budget) \
            if holdout_lane_mod > 0 else None

    def add_encoded(self, enc) -> int:
        """Insert EncodedExamples rows (host arrays); weight==0 padding rows
        are dropped.  Rows arrive weight-descending from encode_examples, so
        the kept prefix is contiguous.  Returns rows added to the TRAINING
        ring (holdout-lane rows go to self.val instead)."""
        w = np.asarray(enc.weight)
        n = int((w > 0).sum())
        if n == 0:
            return 0
        train_ids = np.arange(n)
        if self.val is not None and getattr(enc, "lane", None) is not None:
            lane = np.asarray(enc.lane)[:n]
            hold = lane % self.holdout_lane_mod == 0
            val_ids = np.flatnonzero(hold)
            if val_ids.size:
                self.val._insert(np.asarray(enc.state)[val_ids],
                                 np.asarray(enc.pi_vals)[val_ids],
                                 np.asarray(enc.pi_idx)[val_ids],
                                 np.asarray(enc.z)[val_ids],
                                 np.asarray(enc.q)[val_ids],
                                 np.asarray(enc.valids)[val_ids])
            train_ids = np.flatnonzero(~hold)
            if train_ids.size == 0:
                return 0
        self._insert(np.asarray(enc.state)[train_ids],
                     np.asarray(enc.pi_vals)[train_ids],
                     np.asarray(enc.pi_idx)[train_ids],
                     np.asarray(enc.z)[train_ids],
                     np.asarray(enc.q)[train_ids],
                     np.asarray(enc.valids)[train_ids])
        return int(train_ids.size)

    def add_batch(self, batch) -> int:
        """Insert a dense (T, B, ...) SelfPlayBatch (host arrays); weight==0
        slots dropped.  Densely-collected path (tests, host actors)."""
        B = np.asarray(batch.weight).shape[1]
        w = np.asarray(batch.weight).reshape(-1)
        keep = np.flatnonzero(w > 0)
        if self.val is not None and keep.size:
            hold = keep % B % self.holdout_lane_mod == 0
            val_keep, keep = keep[hold], keep[~hold]
            if val_keep.size:
                vflat = lambda x: np.asarray(x).reshape(
                    (-1,) + x.shape[2:])[val_keep]
                pi = vflat(batch.pi).astype(np.float32)
                k = min(self.k_pi, pi.shape[-1])
                idx = np.argpartition(-pi, k - 1, axis=-1)[:, :k] \
                    .astype(np.int32)
                vals = np.take_along_axis(pi, idx, axis=-1).astype(np.float16)
                pad = self.k_pi - k
                if pad:
                    idx = np.pad(idx, ((0, 0), (0, pad)))
                    vals = np.pad(vals, ((0, 0), (0, pad)))
                self.val._insert(vflat(batch.state), vals, idx,
                                 vflat(batch.z).astype(np.float16),
                                 vflat(batch.q).astype(np.float16),
                                 np.packbits(vflat(batch.valids), axis=-1))
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

    def sample(self, rng: np.random.Generator, batch_size: int,
               window: int | None = None) -> Dict[str, np.ndarray]:
        """Uniform sampling without replacement within a batch (reference
        GenericNNetWrapper.py:60).  `window` restricts sampling to the
        NEWEST `window` rows — the Coach passes the example count of the
        last numItersHistory iterations, the reference's drop-oldest
        example history (Coach.py:106,186-189).  Returns ENCODED rows —
        the trainer uploads them as-is and decodes on device
        (codec.decode_batch)."""
        w = self.size if window is None else max(1, min(window, self.size))
        rel = rng.choice(w, size=batch_size, replace=batch_size > w)
        ids = (self.head - 1 - rel) % self.capacity
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
        # rows are persisted in AGE order (oldest first): once the ring has
        # wrapped, slot order != age order, and load()'s head=n%capacity
        # reconstruction is only correct for age-ordered rows — this keeps
        # newest-row diagnostics and the validation fallback valid across a
        # resume (and across capacity changes)
        ids = (self.head - self.size + np.arange(self.size)) % self.capacity
        extra = {}
        if self.val is not None and self.val.size:
            v = self.val
            vids = (v.head - v.size + np.arange(v.size)) % v.capacity
            extra = dict(val_state=v.state[vids],
                         val_pi_vals=v.pi_vals[vids],
                         val_pi_idx=v.pi_idx[vids],
                         val_z=v.z[vids], val_q=v.q[vids],
                         val_valids=v.valids[vids],
                         val_meta=np.array([v.head, v.size, v.total_added]))
        saver(tmp, state=self.state[ids],
              pi_vals=self.pi_vals[ids],
              pi_idx=self.pi_idx[ids],
              z=self.z[ids], q=self.q[ids],
              valids=self.valids[ids],
              meta=np.array([self.head, self.size, self.total_added,
                             self.k_pi]), **extra)
        os.replace(tmp, path if path.endswith(".npz") else path + ".npz")

    def load(self, path: str):
        d = np.load(path)
        total = int(d["meta"][1])
        n = min(total, self.capacity)
        # rows on disk are age-ordered (oldest first, see save()); when the
        # target buffer is smaller, keep the NEWEST n rows
        s = total - n
        if "pi" in d:  # legacy dense-format snapshot
            pi = d["pi"][s:s + n].astype(np.float32)
            k = min(self.k_pi, pi.shape[-1])
            idx = np.argpartition(-pi, k - 1, axis=-1)[:, :k].astype(np.int32)
            self.pi_idx[:n, :k] = idx
            self.pi_vals[:n, :k] = np.take_along_axis(pi, idx, axis=-1)
            self.valids[:n] = np.packbits(d["valids"][s:s + n], axis=-1)
        else:
            k = min(self.k_pi, d["pi_vals"].shape[-1])
            self.pi_vals[:n, :k] = d["pi_vals"][s:s + n, :k]
            self.pi_idx[:n, :k] = d["pi_idx"][s:s + n, :k]
            self.valids[:n] = d["valids"][s:s + n]
        self.state[:n] = d["state"][s:s + n]
        self.z[:n] = d["z"][s:s + n]
        self.q[:n] = d["q"][s:s + n]
        self.size = n
        self.head = n % self.capacity
        self.total_added = int(d["meta"][2])
        if self.val is not None and "val_state" in d:
            v = self.val
            vtotal = int(d["val_meta"][1])
            m = min(vtotal, v.capacity)
            vs = vtotal - m
            kv = min(v.k_pi, d["val_pi_vals"].shape[-1])
            v.state[:m] = d["val_state"][vs:vs + m]
            v.pi_vals[:m, :kv] = d["val_pi_vals"][vs:vs + m, :kv]
            v.pi_idx[:m, :kv] = d["val_pi_idx"][vs:vs + m, :kv]
            v.z[:m] = d["val_z"][vs:vs + m]
            v.q[:m] = d["val_q"][vs:vs + m]
            v.valids[:m] = d["val_valids"][vs:vs + m]
            v.size = m
            v.head = m % v.capacity
            v.total_added = int(d["val_meta"][2])
