"""Vectorized self-play actor.

TPU-native replacement for the reference's thread-per-episode self-play with
lock-chain inference batching (/root/reference/Coach.py:37-148): B games step
in lockstep inside one jitted lax.scan over move slots, with auto-reset when
games finish and an on-device reverse scan that backfills final returns into
every example of the finished episode (the reference does this on the host at
episode end, Coach.py:75-84).

Preserved semantics:
- playout-cap randomization: per-lane full/fast search budgets; only
  full-search moves yield training examples (Coach.py:65-69, MCTS.py:58-59)
- per-move temperature schedule temp_for_selfplay (Coach.py:266-271)
- example tuple (canonical state, pruned-visit policy, rolled final result,
  valid mask, root Q vector) (Coach.py:76-84); symmetry expansion happens at
  training time instead of collection time (same distribution, 8x less
  replay memory)

Two execution shapes:
- run_selfplay: one device program covering num_moves plies (scan +
  on-device reverse backfill) — the fast path.
- run_selfplay_chunked: a host loop stitching shorter scans through an
  explicit carry, with the reverse backfill on the host.  Exists because
  long scans of some game engines (splendor at >=48 moves) trip a TPU
  kernel fault; shorter programs side-step it at identical semantics.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from alphazero_tpu.config import MCTSConfig, SelfPlayConfig
from alphazero_tpu.games.base import GameSpec
from alphazero_tpu.search.mcts import (clamp_to_valid, mcts_search,
                                       sample_action)


@struct.dataclass
class SelfPlayBatch:
    """(T, B, ...) example arrays.  weight==0 marks unusable slots (fast
    searches or episodes still unfinished at scan end)."""
    state: jax.Array    # (T, B, *state_shape) int8 — canonical
    pi: jax.Array       # (T, B, A) float32 — normalized pruned visit policy
    z: jax.Array        # (T, B, P) float32 — final result, example frame
    q: jax.Array        # (T, B, P) float32 — root MCTS Q, example frame
    valids: jax.Array   # (T, B, A) bool
    weight: jax.Array   # (T, B) float32


class SelfPlayStats(NamedTuple):
    episodes_done: jax.Array     # () int32
    examples: jax.Array          # () int32 — weight > 0 slots
    moves: jax.Array             # () int32 — T*B
    sims: jax.Array              # () int64-ish float — total search sims
    avg_game_length: jax.Array   # () float32


def _net_eval(net):
    def eval_fn(params, obs, valids):
        log_pi, v = net.apply(params, obs, valids)
        return jnp.exp(log_pi), v
    return eval_fn


def _one_move_factory(spec: GameSpec, net, params, mc: MCTSConfig,
                      sp: SelfPlayConfig, B: int):
    """Build the per-ply step function.  Carry: (states, ep_step,
    cur_player, k_scan); k_scan rides in the carry so chunked callers can
    re-key without retracing."""
    P = spec.num_players
    n_fast = max(1, mc.num_sims // mc.ratio_full)
    n_full = min(B, max(1, round(B * mc.prob_full)))
    eval_fn = _net_eval(net)
    use_noise = mc.dirichlet_alpha != 0

    # playout-cap randomization by LANE SPLIT: exactly round(B*prob_full)
    # lanes run the full budget, the rest the fast budget, each group in its
    # own right-sized search scan.  Running everyone to num_sims with masked
    # budgets (the naive lockstep PCR) wastes ~(1-prob)*(1-1/ratio) of all
    # search compute on lanes that finished their budget.  (Reference PCR is
    # Bernoulli per move, MCTS.py:58-59; a fixed fraction has the same mean
    # and less variance.)

    def one_move(carry, t):
        states, ep_step, cur_player, k_scan = carry
        kt = jax.random.fold_in(k_scan, t)
        k_full, k_mcts, k_act, k_step, k_reset = jax.random.split(kt, 5)

        perm = jax.random.permutation(k_full, B)
        full = jnp.zeros((B,), bool).at[perm[:n_full]].set(True)

        def search(idx, sims, noise, forced):
            nb = idx.shape[0]
            return mcts_search(
                spec, eval_fn, params, states[idx], jax.random.fold_in(
                    k_mcts, sims),
                jnp.full((nb,), sims, jnp.int32),
                jnp.full((nb,), noise, bool),
                jnp.full((nb,), forced, bool),
                cfg=mc, num_sims_max=sims, use_noise=noise)[0]

        if not sp.pcr_split and n_full < B:
            # merged PCR: ONE search over all lanes with per-lane budgets
            # (fast lanes sit masked-inactive past n_fast sims).  Spends
            # more device compute than the two right-sized searches but
            # compiles HALF the per-move body — the binding constraint for
            # engines near the TPU program-size fault (docs/tpu_limits.md)
            out, _ = mcts_search(
                spec, eval_fn, params, states, jax.random.fold_in(k_mcts, 1),
                jnp.where(full, mc.num_sims, n_fast).astype(jnp.int32),
                full & use_noise,
                full & mc.forced_playouts,
                cfg=mc, num_sims_max=mc.num_sims, use_noise=use_noise)
        else:
            out_f = search(perm[:n_full], mc.num_sims, use_noise,
                           mc.forced_playouts)
            if n_full < B:
                out_s = search(perm[n_full:], n_fast, False, False)

                def unsplit(a, b):
                    buf = jnp.zeros((B,) + a.shape[1:], a.dtype)
                    return (buf.at[perm[:n_full]].set(a)
                            .at[perm[n_full:]].set(b))

                out = jax.tree.map(unsplit, out_f, out_s)
            else:
                out = out_f

        # temperature decay by episode step (episodeStep starts at 1,
        # Coach.py:59-63)
        t0, t1, hl = sp.temp_begin, sp.temp_end, sp.temp_half_life
        n = (ep_step + 1).astype(jnp.float32)
        if hl < 0:
            temp = jnp.where(n > -hl, t1, t0)
        else:
            temp = t1 + (t0 - t1) * 0.5 ** (n / hl)
        action = clamp_to_valid(
            sample_action(k_act, out.counts, temp[:, None]),
            out.root_valids)

        counts_sum = jnp.maximum(out.counts.sum(-1, keepdims=True), 1e-30)
        pi = out.counts / counts_sum

        step_keys = jax.random.split(k_step, B)
        seeds = jnp.zeros((B,), jnp.int32)  # real moves use true randomness
        next_states, swap = jax.vmap(spec.step_canonical)(
            states, action, step_keys, seeds)
        term = jax.vmap(spec.terminal)(next_states)       # canonical frame
        done = jnp.any(term != 0, axis=-1)
        next_player = (cur_player + swap) % P
        # absolute-frame result: canonical index 0 = next_player
        result_abs = jax.vmap(jnp.roll)(term, next_player)

        # auto-reset finished games
        fresh = jax.vmap(spec.init)(jax.random.split(k_reset, B))
        done_b = done.reshape((B,) + (1,) * (states.ndim - 1))
        new_states = jnp.where(done_b, fresh, next_states)
        new_ep_step = jnp.where(done, 0, ep_step + 1)
        new_player = jnp.where(done, 0, next_player)

        rec = dict(state=states, pi=pi, valids=out.root_valids, q=out.q,
                   player=cur_player, full=full, done=done,
                   result_abs=result_abs,
                   sims=jnp.int32(n_full * mc.num_sims
                                  + (B - n_full) * n_fast))
        return (new_states, new_ep_step, new_player, k_scan), rec

    return one_move


def _init_carry(spec: GameSpec, key, B: int, mesh=None):
    k_init, k_scan = jax.random.split(key)
    states0 = jax.vmap(spec.init)(jax.random.split(k_init, B))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        states0 = jax.lax.with_sharding_constraint(
            states0, NamedSharding(
                mesh, PartitionSpec("data", *([None] * (states0.ndim - 1)))))
    return (states0, jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
            k_scan)


@functools.partial(jax.jit,
                   static_argnames=("spec", "net", "mc", "sp", "num_moves",
                                    "batch_size", "mesh"))
def run_selfplay(spec: GameSpec, net, params, key, *, mc: MCTSConfig,
                 sp: SelfPlayConfig, num_moves: int, batch_size: int,
                 mesh=None) -> Tuple[SelfPlayBatch, SelfPlayStats]:
    """Play `batch_size` games in lockstep for `num_moves` plies (auto-reset),
    returning training examples with returns backfilled.

    mesh: optional jax.sharding.Mesh with a 'data' axis — game lanes are
    sharded over it (SPMD data parallelism; XLA/GSPMD inserts the
    collectives, SURVEY.md §2.5)."""
    B = batch_size
    P = spec.num_players
    carry0 = _init_carry(spec, key, B, mesh)
    one_move = _one_move_factory(spec, net, params, mc, sp, B)
    _, recs = jax.lax.scan(one_move, carry0,
                           jnp.arange(num_moves, dtype=jnp.int32))

    # --- reverse scan: backfill final results into episode examples ---------
    def backfill(carry, rec):
        pending, have = carry
        pending = jnp.where(rec["done"][:, None], rec["result_abs"], pending)
        have = have | rec["done"]
        # example frame: roll absolute result by -player (Coach.py:79)
        z = jax.vmap(jnp.roll)(pending, -rec["player"])
        w = (have & rec["full"]).astype(jnp.float32)
        return (pending, have), (z, w)

    carry0 = (jnp.zeros((B, P), jnp.float32), jnp.zeros((B,), bool))
    _, (z, weight) = jax.lax.scan(backfill, carry0, recs, reverse=True)

    batch = SelfPlayBatch(state=recs["state"], pi=recs["pi"], z=z,
                          q=recs["q"], valids=recs["valids"], weight=weight)
    stats = SelfPlayStats(
        episodes_done=jnp.sum(recs["done"].astype(jnp.int32)),
        examples=jnp.sum((weight > 0).astype(jnp.int32)),
        moves=jnp.int32(num_moves * B),
        sims=jnp.sum(recs["sims"]),
        avg_game_length=(num_moves * B) /
        jnp.maximum(jnp.sum(recs["done"].astype(jnp.float32)), 1.0),
    )
    return batch, stats


@functools.partial(jax.jit,
                   static_argnames=("spec", "net", "mc", "sp", "num_moves",
                                    "batch_size", "mesh"))
def run_selfplay_dyn(spec: GameSpec, net, params, key, quota, *,
                     mc: MCTSConfig, sp: SelfPlayConfig, num_moves: int,
                     batch_size: int,
                     mesh=None) -> Tuple[SelfPlayBatch, SelfPlayStats]:
    """run_selfplay with a DATA-DEPENDENT move loop: a lax.while_loop that
    stops at `quota` completed episodes (a traced scalar) or `num_moves`
    slots, whichever first, writing records into preallocated (T, ...)
    buffers.  Unwritten slots stay zero (done=False, full=False -> weight 0).

    Two reasons this exists (docs/tpu_limits.md):
    - the data-dependent bound cannot be unrolled by the backend, so the
      compiled program holds ONE move body regardless of num_moves — where
      known-trip-count scans of scan-fault engines (splendor) kill the TPU
      worker past an engine-dependent length;
    - the quota early-exit runs ON DEVICE: one program per iteration, no
      per-chunk host round-trips.

    Combine with cfg.mcts.dyn_sims=True for the smallest program (one sim
    body x one move body).  RNG streams match run_selfplay exactly, so up
    to the stopping point the produced examples are bit-identical."""
    B = batch_size
    P = spec.num_players
    A = spec.num_actions
    T = num_moves
    carry0 = _init_carry(spec, key, B, mesh)
    one_move = _one_move_factory(spec, net, params, mc, sp, B)

    bufs0 = dict(
        state=jnp.zeros((T, B) + spec.state_shape, carry0[0].dtype),
        pi=jnp.zeros((T, B, A), jnp.float32),
        valids=jnp.zeros((T, B, A), bool),
        q=jnp.zeros((T, B, P), jnp.float32),
        player=jnp.zeros((T, B), jnp.int32),
        full=jnp.zeros((T, B), bool),
        done=jnp.zeros((T, B), bool),
        result_abs=jnp.zeros((T, B, P), jnp.float32),
        sims=jnp.zeros((T,), jnp.int32),
    )
    quota = jnp.minimum(jnp.asarray(quota, jnp.int32), T * B)

    def cond(st):
        t, _, _, eps = st
        return (t < T) & (eps < quota)

    def body(st):
        t, carry, bufs, eps = st
        carry, rec = one_move(carry, t)
        bufs = {k: jax.lax.dynamic_update_index_in_dim(bufs[k], rec[k], t, 0)
                for k in bufs}
        return (t + 1, carry, bufs,
                (eps + jnp.sum(rec["done"])).astype(jnp.int32))

    t_end, _, recs, episodes = jax.lax.while_loop(
        cond, body, (jnp.int32(0), carry0, bufs0, jnp.int32(0)))

    # reverse backfill over the static buffer: slots >= t_end are all-zero
    # (done=False) and contribute nothing
    def backfill(carry, rec):
        pending, have = carry
        pending = jnp.where(rec["done"][:, None], rec["result_abs"], pending)
        have = have | rec["done"]
        z = jax.vmap(jnp.roll)(pending, -rec["player"])
        w = (have & rec["full"]).astype(jnp.float32)
        return (pending, have), (z, w)

    bf0 = (jnp.zeros((B, P), jnp.float32), jnp.zeros((B,), bool))
    _, (z, weight) = jax.lax.scan(backfill, bf0, recs, reverse=True)

    batch = SelfPlayBatch(state=recs["state"], pi=recs["pi"], z=z,
                          q=recs["q"], valids=recs["valids"], weight=weight)
    moves = t_end * B
    stats = SelfPlayStats(
        episodes_done=episodes,
        examples=jnp.sum((weight > 0).astype(jnp.int32)),
        moves=moves,
        sims=jnp.sum(recs["sims"]),
        avg_game_length=moves /
        jnp.maximum(episodes.astype(jnp.float32), 1.0),
    )
    return batch, stats


@functools.partial(jax.jit,
                   static_argnames=("spec", "net", "mc", "sp", "num_moves",
                                    "batch_size"))
def _selfplay_chunk(spec, net, params, carry, *, mc, sp, num_moves,
                    batch_size):
    one_move = _one_move_factory(spec, net, params, mc, sp, batch_size)
    carry, recs = jax.lax.scan(one_move, carry,
                               jnp.arange(num_moves, dtype=jnp.int32))
    return carry, recs


@jax.jit
def _backfill_chunk(recs, carry):
    """Reverse-scan one chunk of records: same recurrence as run_selfplay's
    backfill, with the (pending, have) carry crossing chunk boundaries so
    chunks can be processed newest-to-oldest on device."""
    def backfill(c, rec):
        pending, have = c
        pending = jnp.where(rec["done"][:, None], rec["result_abs"], pending)
        have = have | rec["done"]
        z = jax.vmap(jnp.roll)(pending, -rec["player"])
        w = (have & rec["full"]).astype(jnp.float32)
        return (pending, have), (z, w)

    carry, (z, weight) = jax.lax.scan(backfill, carry, recs, reverse=True)
    return carry, z, weight


def run_selfplay_chunked(spec: GameSpec, net, params, key, *, mc: MCTSConfig,
                         sp: SelfPlayConfig, num_moves: int, chunk_moves: int,
                         batch_size: int, mesh=None, k_pi: int = None,
                         stop_after_episodes: int = 0):
    """Semantically equivalent to run_selfplay, stitched from
    ceil(num_moves/chunk_moves) shorter device programs through an explicit
    carry.  Exists because long scans of some game engines trip a TPU kernel
    fault (docs/tpu_limits.md); shorter programs side-step it.

    The reverse backfill runs ON DEVICE per chunk (newest chunk first,
    threading the pending-result carry), so the chunked path costs the same
    device->host bytes as run_selfplay:

    - k_pi given: each chunk is codec-encoded on device (sparse pi, packed
      valids, f16 scalars) before the transfer; returns
      (list[EncodedExamples host], SelfPlayStats) for ReplayBuffer.add_encoded.
    - k_pi None: returns the dense (SelfPlayBatch host, SelfPlayStats) like
      run_selfplay (tests, offline tooling).

    mesh: optional Mesh with a 'data' axis; game lanes shard over it exactly
    as in run_selfplay (the sharding rides the scan carry through every
    chunk program)."""
    B, P = batch_size, spec.num_players
    carry = _init_carry(spec, key, B, mesh)
    chunks = []     # device record trees
    sizes = []
    done_moves = 0
    eps_so_far = 0
    while done_moves < num_moves:
        n = min(chunk_moves, num_moves - done_moves)
        # re-key each chunk (k_scan is in the carry; shift it so chunk c's
        # move t never reuses chunk 0's fold_in stream)
        states, ep, pl, k_scan = carry
        carry = (states, ep, pl, jax.random.fold_in(k_scan, 1000 + done_moves))
        carry, recs = _selfplay_chunk(spec, net, params, carry, mc=mc, sp=sp,
                                      num_moves=n, batch_size=B)
        chunks.append(recs)
        sizes.append(n)
        done_moves += n
        if stop_after_episodes:
            # quota early-exit: latency-bound engines (docs/tpu_limits.md)
            # pay a ~B-independent wall cost per MOVE, so scanning past the
            # episode quota burns wall-clock for data the Coach won't need
            # this iteration.  The check costs one scalar transfer per chunk.
            eps_so_far += int(jnp.sum(recs["done"]))
            if eps_so_far >= stop_after_episodes:
                break

    # device reverse backfill, newest chunk -> oldest
    bf = (jnp.zeros((B, P), jnp.float32), jnp.zeros((B,), bool))
    zw = [None] * len(chunks)
    for i in range(len(chunks) - 1, -1, -1):
        bf, z_i, w_i = _backfill_chunk(chunks[i], bf)
        zw[i] = (z_i, w_i)

    episodes = sum(int(jnp.sum(c["done"])) for c in chunks)
    T = sum(sizes)
    stats = SelfPlayStats(
        episodes_done=np.int32(episodes),
        examples=np.int32(sum(int(jnp.sum(w > 0)) for _, w in zw)),
        moves=np.int32(T * B),
        sims=np.int64(sum(int(jnp.sum(c["sims"])) for c in chunks)),
        avg_game_length=np.float32(T * B / max(episodes, 1)),
    )

    def chunk_batch(recs, z, w):
        return SelfPlayBatch(state=recs["state"], pi=recs["pi"], z=z,
                             q=recs["q"], valids=recs["valids"], weight=w)

    if k_pi is not None:
        from alphazero_tpu.parallel.mesh import fetch_replicated
        from alphazero_tpu.selfplay.codec import encode_examples
        n_full = min(B, max(1, round(B * mc.prob_full)))
        encs = [fetch_replicated(encode_examples(
                    chunk_batch(recs, z, w), num_rows=n * n_full, k_pi=k_pi),
                    mesh)
                for recs, (z, w), n in zip(chunks, zw, sizes)]
        return encs, stats

    host = [jax.device_get((c, z, w)) for c, (z, w) in zip(chunks, zw)]
    batch = SelfPlayBatch(
        state=np.concatenate([c["state"] for c, _, _ in host]),
        pi=np.concatenate([c["pi"] for c, _, _ in host]),
        z=np.concatenate([z for _, z, _ in host]),
        q=np.concatenate([c["q"] for c, _, _ in host]),
        valids=np.concatenate([c["valids"] for c, _, _ in host]),
        weight=np.concatenate([w for _, _, w in host]),
    )
    return batch, stats
