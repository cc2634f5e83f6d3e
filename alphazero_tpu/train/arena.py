"""Arena: vmapped head-to-head match runner.

Reference behavior (/root/reference/Arena.py:35-140): K games between two
players with alternating seating, per-move validity assert, final result from
absolute player 0's perspective; the gate accepts the new net at >= 60 %
(Coach.py:200-215).  Here all K games run in lockstep inside one jit: per
move, a single batched MCTS runs for all games, and the evaluator picks each
lane's parameters by whose turn it is (both nets are evaluated and selected
per lane — 2x NN FLOPs, one compiled program, no host round-trips).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from alphazero_tpu.config import MCTSConfig
from alphazero_tpu.games.base import GameSpec
from alphazero_tpu.search.mcts import (argmax_action, clamp_to_valid,
                                       mcts_search, temp_for_game)
from alphazero_tpu.search.tree import extract_subtree, make_tree


class ArenaResult(NamedTuple):
    one_wins: jax.Array    # () int32 — player-A wins
    two_wins: jax.Array    # () int32 — player-B wins
    draws: jax.Array       # () int32
    unfinished: jax.Array  # () int32 — games truncated at move cap


def _paired_eval(net_a, net_b):
    def eval_fn(args, obs, valids):
        pa, pb, use_a = args             # use_a: (B,) bool, per lane
        log_a, va = net_a.apply(pa, obs, valids)
        log_b, vb = net_b.apply(pb, obs, valids)
        m = use_a[:, None]
        return (jnp.exp(jnp.where(m, log_a, log_b)),
                jnp.where(m, va, vb))
    return eval_fn


def _match_setup(spec: GameSpec, net, key, *, cfg: MCTSConfig,
                 num_games: int, net_b, init_state, reuse_tree):
    """Shared state init for the scan-mode and host-mode match runners."""
    B = num_games
    P = spec.num_players
    eval_fn = _paired_eval(net, net_b if net_b is not None else net)
    extra = cfg.num_sims if reuse_tree else 0
    N = cfg.num_sims + 1 + extra

    k_init, k_scan = jax.random.split(key)
    if init_state is None:
        states0 = jax.vmap(spec.init)(jax.random.split(k_init, B))
    else:
        states0 = jnp.broadcast_to(
            jnp.asarray(init_state, jnp.int8), (B, *spec.state_shape))
    seat_a = jnp.arange(B, dtype=jnp.int32) % P   # absolute seat of player A

    tree0 = make_tree(spec, B, N, jnp.dtype(cfg.q_dtype),
                      jnp.dtype(cfg.prior_dtype))
    ok0 = jnp.zeros((B,), bool)
    carry0 = (states0, jnp.zeros((B,), jnp.int32), jnp.zeros((B,), bool),
              jnp.zeros((B, P), jnp.float32), tree0, tree0, ok0, ok0)
    return eval_fn, extra, N, seat_a, k_scan, carry0


def _score(result, done, seat_a) -> ArenaResult:
    """Score from each player's seat (reference counts gameResult == +-1,
    Arena.py:128-133; draw codes like +-0.01 count as draws)."""
    res_a = jnp.take_along_axis(result, seat_a[:, None], axis=1)[:, 0]
    one_wins = jnp.sum((res_a > 0.5) & done)
    two_wins = jnp.sum((res_a < -0.5) & done)
    draws = jnp.sum((jnp.abs(res_a) <= 0.5) & done)
    return ArenaResult(one_wins.astype(jnp.int32),
                       two_wins.astype(jnp.int32),
                       draws.astype(jnp.int32),
                       jnp.sum(~done).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("spec", "net", "cfg",
                                             "num_games", "temp_half_life",
                                             "net_b", "reuse_tree",
                                             "reuse_side", "cfg_b"))
def play_matches(spec: GameSpec, net, params_a, params_b, key, *,
                 cfg: MCTSConfig, num_games: int,
                 temp_half_life: int = 10, net_b=None,
                 init_state=None, reuse_tree: bool = False,
                 reuse_side: str = "both", cfg_b=None) -> ArenaResult:
    """num_games lanes; lane i seats A as (absolute) player i%2 — the
    reference's 1-2-2-1 alternation exists for tree-reuse fairness
    (Arena.py:120-127).  net_b lets the two players use different
    architectures (the reference rebuilds each player's net from its own
    checkpoint, pit.py:42-58).  init_state starts every lane from a fixed
    board snapshot (fixed-position regression, the reference's
    injected-board feature, Arena.py:60-65).

    reuse_tree=True carries each player's search tree across its moves
    within a game (the reference persists its MCTS dicts across moves,
    resetting only between games, MCTS.py:85-91 / Arena.py:99): every ply
    BOTH players' carried trees are re-rooted through the played action
    (the mover's directly; the opponent's to keep it synced with the
    position), at the cost of a 2x-sims-wide node arena and two
    extract_subtree passes per ply.  On platforms where the resulting
    whole-game scan program is too large (the axon TPU worker faults on
    it), use play_matches_host instead — same semantics, host move loop."""
    B = num_games
    eval_fn, extra, N, seat_a, k_scan, carry0 = _match_setup(
        spec, net, key, cfg=cfg, num_games=num_games, net_b=net_b,
        init_state=init_state, reuse_tree=reuse_tree)
    one_move = _match_move_factory(
        spec, eval_fn, params_a, params_b, seat_a, k_scan, cfg=cfg,
        cfg_b=cfg_b, extra=extra, N=N, temp_half_life=temp_half_life,
        reuse_tree=reuse_tree, reuse_side=reuse_side)
    (_, _, done, result, *_), _ = jax.lax.scan(
        one_move, carry0, jnp.arange(spec.max_game_length, dtype=jnp.int32))
    return _score(result, done, seat_a)


@functools.partial(jax.jit, static_argnames=("spec", "net", "cfg",
                                             "num_games", "temp_half_life",
                                             "net_b", "reuse_tree",
                                             "reuse_side", "cfg_b"))
def play_matches_dyn(spec: GameSpec, net, params_a, params_b, key, *,
                     cfg: MCTSConfig, num_games: int,
                     temp_half_life: int = 10, net_b=None,
                     init_state=None, reuse_tree: bool = False,
                     reuse_side: str = "both", cfg_b=None) -> ArenaResult:
    """play_matches with a DATA-DEPENDENT move loop: a lax.while_loop that
    exits as soon as every lane is done.  Two wins over the scan runner on
    scan-fault engines (docs/tpu_limits.md): the backend cannot unroll the
    data-dependent bound (one compiled move body regardless of
    max_game_length), and finished matches stop paying for empty plies
    (the scan always runs all max_game_length slots).  Combine with
    cfg.dyn_sims for the smallest program.  Bit-exact with play_matches:
    the per-ply RNG stream is identical and frozen lanes don't change."""
    eval_fn, extra, N, seat_a, k_scan, carry0 = _match_setup(
        spec, net, key, cfg=cfg, num_games=num_games, net_b=net_b,
        init_state=init_state, reuse_tree=reuse_tree)
    one_move = _match_move_factory(
        spec, eval_fn, params_a, params_b, seat_a, k_scan, cfg=cfg,
        cfg_b=cfg_b, extra=extra, N=N, temp_half_life=temp_half_life,
        reuse_tree=reuse_tree, reuse_side=reuse_side)

    def cond(st):
        t, carry = st
        return (t < spec.max_game_length) & ~jnp.all(carry[2])

    def body(st):
        t, carry = st
        carry, _ = one_move(carry, t)
        return (t + 1, carry)

    _, (_, _, done, result, *_) = jax.lax.while_loop(
        cond, body, (jnp.int32(0), carry0))
    return _score(result, done, seat_a)


def play_matches_host(spec: GameSpec, net, params_a, params_b, key, *,
                      cfg: MCTSConfig, num_games: int,
                      temp_half_life: int = 10, net_b=None,
                      init_state=None, reuse_tree: bool = False,
                      reuse_side: str = "both", cfg_b=None) -> ArenaResult:
    """play_matches semantics driven by a HOST move loop: one per-move jitted
    program instead of one whole-game scan.  The tree-reuse body (search +
    two extract_subtree passes, scanned over max_game_length plies) compiles
    to a program large enough to fault the axon TPU worker; per-move
    programs side-step that and allow early exit once every lane finishes.

    Statistically equivalent to the scan runner, not bitwise: XLA fuses the
    standalone per-move program differently from the scan body, and the
    reassociated float numerics can flip near-tie argmax moves in individual
    games (measured on CPU; win totals agree within seat noise)."""
    B = num_games
    eval_fn, extra, N, seat_a, k_scan, carry = _match_setup(
        spec, net, key, cfg=cfg, num_games=num_games, net_b=net_b,
        init_state=init_state, reuse_tree=reuse_tree)
    one_move = _match_move_factory(
        spec, eval_fn, params_a, params_b, seat_a, k_scan, cfg=cfg,
        cfg_b=cfg_b, extra=extra, N=N, temp_half_life=temp_half_life,
        reuse_tree=reuse_tree, reuse_side=reuse_side)
    # deep-copy so every donated leaf is a distinct buffer (zeros of equal
    # shape/dtype — and the two tree arenas — may alias the same constant)
    carry = jax.tree.map(jnp.copy, carry)
    body = jax.jit(lambda c, t: one_move(c, t)[0], donate_argnums=(0,))
    for t in range(spec.max_game_length):
        carry = body(carry, jnp.int32(t))
        if bool(jnp.all(carry[2])):          # all lanes done
            break
    _, _, done, result, *_ = carry
    return _score(result, done, seat_a)


def _match_move_factory(spec: GameSpec, eval_fn, params_a, params_b, seat_a,
                        k_scan, *, cfg: MCTSConfig, cfg_b, extra: int, N: int,
                        temp_half_life: int, reuse_tree: bool,
                        reuse_side: str):
    """One arena ply (search both sides, pick, step, re-root carried trees);
    shared by the scan-mode and host-mode runners."""
    B = seat_a.shape[0]
    P = spec.num_players

    def one_move(carry, t):
        states, cur_player, done, result, ta, tb, oka, okb = carry
        kt = jax.random.fold_in(k_scan, t)
        k_mcts, k_act, k_step = jax.random.split(kt, 3)

        use_a = cur_player == seat_a
        budgets = jnp.where(done, 1, cfg.num_sims).astype(jnp.int32)
        if reuse_tree:
            def blend(xa, xb):
                m = use_a.reshape((B,) + (1,) * (xa.ndim - 1))
                return jnp.where(m, xa, xb)
            init_tree = jax.tree.map(blend, ta, tb)
            rm = jnp.where(use_a, oka, okb)
            if reuse_side == "a":
                # asymmetric duel: only player A reuses (for measuring the
                # Elo value of reuse at equal sims)
                rm = rm & use_a
        else:
            init_tree, rm = None, None
        out, trees = mcts_search(
            spec, eval_fn, (params_a, params_b, use_a),
            states, k_mcts, budgets,
            noise_mask=jnp.zeros((B,), bool),
            forced_mask=jnp.full((B,), cfg.forced_playouts),
            cfg=cfg, num_sims_max=cfg.num_sims, use_noise=False,
            init_tree=init_tree, reuse_mask=rm, extra_nodes=extra)

        temp = temp_for_game(temp_half_life, (t + 1).astype(jnp.float32))
        action = clamp_to_valid(argmax_action(k_act, out.counts, temp),
                                out.root_valids)
        if cfg_b is not None:
            # search-semantics duel: player B picks from its OWN search
            # config (e.g. depth-capped vs exact at equal sims)
            out_b, _ = mcts_search(
                spec, eval_fn, (params_a, params_b, use_a),
                states, k_mcts, budgets,
                noise_mask=jnp.zeros((B,), bool),
                forced_mask=jnp.full((B,), cfg_b.forced_playouts),
                cfg=cfg_b, num_sims_max=cfg_b.num_sims, use_noise=False)
            action_b = clamp_to_valid(
                argmax_action(k_act, out_b.counts, temp), out_b.root_valids)
            action = jnp.where(use_a, action, action_b)

        if reuse_tree:
            # re-root the mover's fresh search tree AND the opponent's
            # carried tree through the played action
            sub_m, ok_m = extract_subtree(trees, action, N, max_keep=extra)
            other = jax.tree.map(lambda xa, xb: jnp.where(
                use_a.reshape((B,) + (1,) * (xa.ndim - 1)), xb, xa), ta, tb)
            ok_o = jnp.where(use_a, okb, oka)
            sub_o, ok_o2 = extract_subtree(other, action, N, max_keep=extra)
            ok_o = ok_o & ok_o2
            ta = jax.tree.map(
                lambda m_, o_: jnp.where(
                    use_a.reshape((B,) + (1,) * (m_.ndim - 1)), m_, o_),
                sub_m, sub_o)
            tb = jax.tree.map(
                lambda m_, o_: jnp.where(
                    use_a.reshape((B,) + (1,) * (m_.ndim - 1)), o_, m_),
                sub_m, sub_o)
            oka = jnp.where(use_a, ok_m, ok_o)
            okb = jnp.where(use_a, ok_o, ok_m)

        step_keys = jax.random.split(k_step, B)
        next_states, swap = jax.vmap(spec.step_canonical)(
            states, action, step_keys, jnp.zeros((B,), jnp.int32))
        term = jax.vmap(spec.terminal)(next_states)
        next_player = (cur_player + swap) % P
        result_abs = jax.vmap(jnp.roll)(term, next_player)
        new_done = jnp.any(term != 0, axis=-1)

        # freeze finished lanes
        keep = done.reshape((B,) + (1,) * (states.ndim - 1))
        states = jnp.where(keep, states, next_states)
        result = jnp.where(done[:, None], result, result_abs)
        cur_player = jnp.where(done, cur_player, next_player)
        done = done | new_done
        return (states, cur_player, done, result, ta, tb, oka, okb), None

    return one_move


def play_matches_auto(spec: GameSpec, net, params_a, params_b, key,
                      **kw) -> ArenaResult:
    """play_matches, routed around the TPU long-scan fault on engines whose
    whole-game scan exceeds the measured threshold (GameSpec.safe_scan_moves,
    docs/tpu_limits.md) — the same condition under which Coach.self_play
    auto-chunks.  In small-program mode (cfg.dyn_sims) the on-device
    dynamic runner takes that route (one un-unrollable move body, all-done
    early exit); otherwise the host move loop does.  On CPU (no fault) the
    scan runner always wins: one program, no per-move dispatch."""
    risky = (spec.safe_scan_moves
             and spec.safe_scan_moves < spec.max_game_length
             and jax.default_backend() not in ("cpu",))
    if not risky:
        fn = play_matches
    elif kw.get("cfg") is not None and kw["cfg"].dyn_sims:
        fn = play_matches_dyn
    else:
        fn = play_matches_host
    return fn(spec, net, params_a, params_b, key, **kw)


def _mcts_vs_random_eval(net):
    def eval_fn(args, obs, valids):
        params, _ = args
        log_p, v = net.apply(params, obs, valids)
        return jnp.exp(log_p), v
    return eval_fn


@functools.partial(jax.jit, static_argnames=("spec", "net", "cfg",
                                             "num_games", "temp_half_life",
                                             "mcts_seats_even"))
def play_vs_random(spec: GameSpec, net, params, key, *, cfg: MCTSConfig,
                   num_games: int, temp_half_life: int = 10,
                   mcts_seats_even: bool = True,
                   init_state=None) -> ArenaResult:
    """MCTS player vs uniform-random baseline (the reference's RandomPlayer,
    e.g. santorini/SantoriniPlayers.py).  Lane i seats the MCTS player at
    absolute seat i%P.  Returns wins for (mcts, random).  init_state starts
    every lane from a fixed board snapshot (Arena.py:60-65)."""
    B = num_games
    P = spec.num_players
    eval_fn = _mcts_vs_random_eval(net)

    k_init, k_scan = jax.random.split(key)
    if init_state is None:
        states0 = jax.vmap(spec.init)(jax.random.split(k_init, B))
    else:
        states0 = jnp.broadcast_to(
            jnp.asarray(init_state, jnp.int8), (B, *spec.state_shape))
    seat_m = jnp.arange(B, dtype=jnp.int32) % P

    def one_move(carry, t):
        states, cur_player, done, result = carry
        kt = jax.random.fold_in(k_scan, t)
        k_mcts, k_act, k_rnd, k_step = jax.random.split(kt, 4)

        mcts_turn = cur_player == seat_m
        budgets = jnp.where(done | ~mcts_turn, 1, cfg.num_sims).astype(jnp.int32)
        out, _ = mcts_search(spec, eval_fn, (params, None), states, k_mcts,
                          budgets, noise_mask=jnp.zeros((B,), bool),
                          forced_mask=jnp.full((B,), cfg.forced_playouts)
                          & mcts_turn,
                          cfg=cfg, num_sims_max=cfg.num_sims, use_noise=False)
        temp = temp_for_game(temp_half_life, (t + 1).astype(jnp.float32))
        a_mcts = clamp_to_valid(argmax_action(k_act, out.counts, temp),
                                out.root_valids)
        # random baseline: uniform over valid moves
        logits = jnp.where(out.root_valids, 0.0, -jnp.inf)
        a_rand = jax.random.categorical(k_rnd, logits, axis=-1)
        action = jnp.where(mcts_turn, a_mcts, a_rand)

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

    res_m = jnp.take_along_axis(result, seat_m[:, None], axis=1)[:, 0]
    one_wins = jnp.sum((res_m > 0.5) & done)
    two_wins = jnp.sum((res_m < -0.5) & done)
    draws = jnp.sum((jnp.abs(res_m) <= 0.5) & done)
    return ArenaResult(one_wins.astype(jnp.int32), two_wins.astype(jnp.int32),
                       draws.astype(jnp.int32),
                       jnp.sum(~done).astype(jnp.int32))
