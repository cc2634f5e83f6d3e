"""Host-level players + interactive game loop.

TPU-native analog of the reference's per-game Players modules
(<game>/<Game>Players.py: RandomPlayer / GreedyPlayer / HumanPlayer) and of
Arena's verbose mode (/root/reference/Arena.py:35-101).  A player is a
callable ``(state, key, move_number) -> action:int`` operating on the
canonical state (player to move = index 0).

The greedy player is game-generic and vectorized: it scores EVERY action in
one jitted vmap of ``step_canonical`` + ``get_score`` (the reference instead
hand-writes a per-game heuristic, several of which are stubs).  Immediate
wins dominate, immediate losses are avoided.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from alphazero_tpu.games.base import GameSpec
from alphazero_tpu.games.display import move_to_str, render

Player = Callable[[jax.Array, jax.Array, int], int]


def random_player(spec: GameSpec) -> Player:
    """Uniform over valid moves (reference RandomPlayer)."""
    valids_f = jax.jit(spec.valids)

    def play(state, key, move_number):
        v = np.asarray(valids_f(state))
        choice = jax.random.choice(key, np.flatnonzero(v))
        return int(choice)

    return play


def greedy_player(spec: GameSpec, lookahead_seed: int = 7) -> Player:
    """One-ply lookahead maximizing the mover's score; +/- 1000 for
    immediate wins/losses.  Chance inside the lookahead is pinned to a
    deterministic universe so the evaluation is stable."""

    @jax.jit
    def score_all(state, key):
        valids = spec.valids(state)

        def one(a):
            nxt, swap = spec.step_canonical(
                state, a, key, jnp.int32(lookahead_seed))
            mover = jnp.mod(-swap, spec.num_players)
            sc = spec.get_score(nxt, mover)
            term = spec.terminal(nxt)
            sc = sc + 1000.0 * term[mover]
            return jnp.where(valids[a], sc, -jnp.inf)

        return jax.vmap(one)(jnp.arange(spec.num_actions))

    def play(state, key, move_number):
        scores = np.asarray(score_all(state, key))
        best = scores.max()
        # random tie-break among the best moves
        cand = np.flatnonzero(scores >= best - 1e-6)
        return int(jax.random.choice(key, cand))

    return play


def mcts_player(spec: GameSpec, net, params, cfg,
                temp_half_life: int = 10) -> Player:
    """Full-search MCTS player (the reference pit.py player, :59-63)."""
    from alphazero_tpu.search.mcts import (argmax_action, mcts_search,
                                           temp_for_game)

    def eval_fn(p, obs, valids):
        log_pi, v = net.apply(p, obs, valids)
        return jnp.exp(log_pi), v

    @jax.jit
    def search(state, key):
        states = state[None]
        out, _ = mcts_search(
            spec, eval_fn, params, states, key,
            jnp.full((1,), cfg.num_sims, jnp.int32),
            noise_mask=jnp.zeros((1,), bool),
            forced_mask=jnp.zeros((1,), bool),
            cfg=cfg, num_sims_max=cfg.num_sims, use_noise=False)
        return out.counts[0]

    def play(state, key, move_number):
        counts = search(state, key)
        k2 = jax.random.fold_in(key, 1)
        temp = temp_for_game(temp_half_life,
                             jnp.float32(move_number + 1))
        a = argmax_action(k2, counts[None], temp)
        return int(a[0])

    return play


def human_player(spec: GameSpec) -> Player:
    """Interactive console player (reference HumanPlayer classes)."""
    valids_f = jax.jit(spec.valids)

    def play(state, key, move_number):
        v = np.asarray(valids_f(state))
        print(render(spec, state))
        legal = np.flatnonzero(v)
        for a in legal:
            print(f"  {a:4d} = {move_to_str(spec, int(a))}")
        while True:
            raw = input(f"move {move_number}, action id> ").strip()
            try:
                a = int(raw)
            except ValueError:
                continue
            if 0 <= a < spec.num_actions and v[a]:
                return a
            print("invalid action")

    return play


def play_host_game(spec: GameSpec, players, key, *, verbose: bool = False,
                   seed_chance: int = 0, max_moves: Optional[int] = None,
                   start_state=None):
    """Play ONE game on the host with arbitrary (possibly interactive)
    players.  ``players[i]`` acts for absolute player i.  Returns the
    per-player result vector in the absolute frame (reference
    Arena.playGame, :35-101).  start_state injects a fixed initial board
    (the reference's --state snapshot feature, Arena.py:60-65)."""
    P = spec.num_players
    assert len(players) == P
    key, k0 = jax.random.split(key)
    state = spec.init(k0) if start_state is None else jnp.asarray(
        start_state, jnp.int8)
    step_f = jax.jit(lambda s, a, k: spec.step_canonical(
        s, a, k, jnp.int32(seed_chance)))
    terminal_f = jax.jit(spec.terminal)
    cur = 0
    for move_number in range(max_moves or spec.max_game_length):
        term = np.asarray(terminal_f(state))
        if term.any():
            return np.roll(term, cur), move_number
        key, k_act, k_step = jax.random.split(key, 3)
        action = players[cur](state, k_act, move_number)
        v = np.asarray(jax.jit(spec.valids)(state))
        assert v[action], f"player {cur} played invalid action {action}"
        if verbose:
            print(f"-- move {move_number}: player {cur} plays "
                  f"{move_to_str(spec, action)}")
        state, swap = step_f(state, jnp.int32(action), k_step)
        cur = (cur + int(swap)) % P
        if verbose:
            print(render(spec, state))
    term = np.asarray(terminal_f(state))
    return np.roll(term, cur), max_moves or spec.max_game_length


@functools.partial(jax.jit, static_argnames=("spec", "num_games",
                                             "lookahead_seed"))
def play_greedy_vs_random(spec: GameSpec, key, *, num_games: int,
                          lookahead_seed: int = 7):
    """Batched greedy-vs-random arena, fully on device: every lane scores
    all actions through one vmapped lookahead per move.  Lane i seats the
    greedy player at absolute seat i % P.  Returns (greedy_wins,
    random_wins, draws, unfinished)."""
    B = num_games
    P = spec.num_players
    k_init, k_scan = jax.random.split(key)
    states0 = jax.vmap(spec.init)(jax.random.split(k_init, B))
    seat_g = jnp.arange(B, dtype=jnp.int32) % P

    def greedy_scores(state, key):
        valids = spec.valids(state)

        def one(a):
            nxt, swap = spec.step_canonical(state, a, key,
                                            jnp.int32(lookahead_seed))
            mover = jnp.mod(-swap, spec.num_players)
            sc = spec.get_score(nxt, mover) + 1000.0 * spec.terminal(nxt)[mover]
            return jnp.where(valids[a], sc, -jnp.inf)

        return jax.vmap(one)(jnp.arange(spec.num_actions))

    def one_move(carry, t):
        states, cur_player, done, result = carry
        kt = jax.random.fold_in(k_scan, t)
        k_g, k_r, k_step = jax.random.split(kt, 3)
        scores = jax.vmap(greedy_scores, in_axes=(0, None))(states, k_g)
        a_greedy = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        valids = jax.vmap(spec.valids)(states)
        logits = jnp.where(valids, 0.0, -jnp.inf)
        a_rand = jax.random.categorical(k_r, logits, axis=-1) \
            .astype(jnp.int32)
        action = jnp.where(cur_player == seat_g, a_greedy, a_rand)

        step_keys = jax.random.split(k_step, B)
        next_states, swap = jax.vmap(spec.step_canonical)(
            states, action, step_keys, jnp.zeros((B,), jnp.int32))
        term = jax.vmap(spec.terminal)(next_states)
        next_player = (cur_player + swap) % P
        result_abs = jax.vmap(jnp.roll)(term, next_player)
        new_done = jnp.any(term != 0, axis=-1)
        keep = done.reshape((B,) + (1,) * (states.ndim - 1))
        states = jnp.where(keep, states, next_states)
        result = jnp.where(done[:, None], result, result_abs)
        cur_player = jnp.where(done, cur_player, next_player)
        done = done | new_done
        return (states, cur_player, done, result), None

    carry0 = (states0, jnp.zeros((B,), jnp.int32), jnp.zeros((B,), bool),
              jnp.zeros((B, P), jnp.float32))
    (_, _, done, result), _ = jax.lax.scan(
        one_move, carry0, jnp.arange(spec.max_game_length, dtype=jnp.int32))
    res_g = jnp.take_along_axis(result, seat_g[:, None], axis=1)[:, 0]
    return (jnp.sum((res_g > 0.5) & done).astype(jnp.int32),
            jnp.sum((res_g < -0.5) & done).astype(jnp.int32),
            jnp.sum((jnp.abs(res_g) <= 0.5) & done).astype(jnp.int32),
            jnp.sum(~done).astype(jnp.int32))


def play_matches_vs_host(spec: GameSpec, net, params, make_player, key, *,
                         cfg, num_games: int, temp_half_life: int = 10):
    """Batched arena: a device-MCTS net player vs a HOST-side scripted
    player (e.g. the Akropolis "Undefeated Strategy" bot,
    /root/reference/akropolis/AkropolisPlayers.py:350-497).

    The reference plays such matches one game at a time; here all
    ``num_games`` run in lockstep — each ply is ONE batched search over
    every lane (bot/finished lanes ride along at budget 1), the host player
    is consulted only for its own lanes, and stepping is one vmapped device
    call.  Lane i seats the net at absolute seat i % P.  make_player() must
    return a fresh Player per lane (host players may be stateful across the
    moves of one game).  Returns an ArenaResult-compatible tuple where
    one=net, two=host player."""
    from alphazero_tpu.search.mcts import (argmax_action, clamp_to_valid,
                                           mcts_search, temp_for_game)
    from alphazero_tpu.train.arena import ArenaResult

    G, P = num_games, spec.num_players
    key, k_init, k_scan = jax.random.split(key, 3)
    seat_net = np.arange(G, dtype=np.int32) % P

    def eval_fn(p, obs, valids):
        log_pi, v = net.apply(p, obs, valids)
        return jnp.exp(log_pi), v

    @jax.jit
    def net_ply(p, states, k, budgets, temp):
        out, _ = mcts_search(
            spec, eval_fn, p, states, k, budgets,
            jnp.zeros((G,), bool), jnp.zeros((G,), bool),
            cfg=cfg, num_sims_max=cfg.num_sims, use_noise=False)
        a = argmax_action(jax.random.fold_in(k, 1), out.counts, temp)
        return clamp_to_valid(a.astype(jnp.int32), out.root_valids)

    @jax.jit
    def step_ply(states, actions, k, done):
        nxt, swap = jax.vmap(spec.step_canonical)(
            states, actions, jax.random.split(k, G),
            jnp.zeros((G,), jnp.int32))
        keep = done.reshape((G,) + (1,) * (states.ndim - 1))
        return jnp.where(keep, states, nxt), jnp.where(done, 0, swap)

    term_f = jax.jit(jax.vmap(spec.terminal))
    valids_f = jax.jit(jax.vmap(spec.valids))

    states = jax.vmap(spec.init)(jax.random.split(k_init, G))
    cur = np.zeros((G,), np.int32)
    done = np.zeros((G,), bool)
    result = np.zeros((G, P), np.float32)
    bots = [make_player() for _ in range(G)]

    for t in range(spec.max_game_length):
        term = np.asarray(term_f(states))
        for g in np.flatnonzero(term.any(-1) & ~done):
            result[g] = np.roll(term[g], cur[g])
        done |= term.any(-1)
        if done.all():
            break
        use_net = (cur == seat_net) & ~done
        budgets = jnp.asarray(np.where(use_net, cfg.num_sims, 1)
                              .astype(np.int32))
        kt = jax.random.fold_in(k_scan, t)
        temp = float(temp_for_game(temp_half_life, t + 1))
        a = np.array(jax.device_get(
            net_ply(params, states, kt, budgets, jnp.float32(temp))))
        bot_lanes = np.flatnonzero(~done & ~use_net)
        if bot_lanes.size:
            states_host = np.asarray(states)
            for g in bot_lanes:
                a[g] = bots[g](states_host[g], jax.random.fold_in(kt, 100 + g),
                               t)
        states, swap = step_ply(states, jnp.asarray(a),
                                jax.random.fold_in(kt, 2), jnp.asarray(done))
        cur = (cur + np.asarray(swap)) % P

    res_net = result[np.arange(G), seat_net]
    return ArenaResult(
        int(((res_net > 0.5) & done).sum()),
        int(((res_net < -0.5) & done).sum()),
        int(((np.abs(res_net) <= 0.5) & done).sum()),
        int((~done).sum()))
