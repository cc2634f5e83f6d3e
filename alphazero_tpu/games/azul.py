"""Azul — TPU-native vectorized engine (bag-draw chance, 2 players).

Behavioral reference: /root/reference/azul/AzulLogicNumba.py (Board jitclass,
335 LoC) + AzulLogic.py factory symmetry table.  From-scratch functional JAX:
move application, round scoring (wall adjacency), bag refills and the
deterministic per-universe LCG tile draw reproduce the reference exactly.

State (23, 6) int8 (reference lines 6-23):
  row 0     scores: P0, P1, round, 0, 0, 0
  row 1     bag tile counts per color
  row 2     discard pile counts
  row 3     centre counts (col 5 = first-player token)
  rows 4-8  factories (5 x counts)
  rows 9-10 pattern-line colors per player (-1 empty; col 5 = token holder)
  rows 11-12 pattern-line tile counts (col 5 = floor count)
  rows 13-22 walls (5 rows per player, 0/1)

Actions (180): factory(6: centre + 5) x color(5) x line(6: 5 rows + floor),
index = factory*30 + color*6 + line (reference lines 26-47).
"""

from __future__ import annotations

import dataclasses
import itertools

import numpy as np
import jax
import jax.numpy as jnp

from alphazero_tpu.games.base import GameSpec

NUM_ACTIONS = 180
LCG_A = 4594591  # reference AzulLogicNumba.py:264
# floor penalty by tile count (reference discard_mapping, :185)
_FLOOR_PENALTY = np.array([0, 1, 2, 4, 6, 8, 11, 14], np.int32)
# all 120 factory permutations (reference AzulLogic.factory_symmetries)
_FACTORY_PERMS = np.array(list(itertools.permutations(range(5))), np.int8)


@dataclasses.dataclass(frozen=True)
class AzulMeta:
    num_players: int


def make_azul(num_players: int = 2) -> GameSpec:
    if num_players != 2:
        raise ValueError("the reference Azul engine is 2-player")
    n = 2

    R_SCORES, R_BAG, R_DISC, R_CENTRE, R_FACT = 0, 1, 2, 3, 4
    R_PCOL, R_PRN, R_WALL = 9, 11, 13

    floor_penalty = jnp.asarray(_FLOOR_PENALTY)
    pow2 = jnp.asarray(2 ** np.arange(5), jnp.int32)

    def _i32(s):
        return s.astype(jnp.int32)

    # ---------------- chance: draw tiles from the bag ----------------

    def draw_one(state, key, seed):
        """One tile draw (reference select_tiles_from_bag inner loop,
        :257-268).  Returns (state, color)."""
        s = _i32(state)
        bag = s[R_BAG, :5]
        total = jnp.maximum(jnp.sum(bag), 1)
        # deterministic LCG pick of a "tile number", then cumsum bucket
        seed2 = jnp.sum(bag * pow2)
        fake = ((LCG_A % total) * ((seed + seed2) % total)) % total
        det_idx = jnp.searchsorted(jnp.cumsum(bag), fake, side="right")
        # true-random: proportional to counts
        rnd_idx = jax.random.categorical(
            key, jnp.where(bag > 0,
                           jnp.log(jnp.maximum(bag, 1).astype(jnp.float32)),
                           -jnp.inf))
        idx = jnp.where(seed == 0, rnd_idx, det_idx).astype(jnp.int32)
        state = state.at[R_BAG, idx].add(-1)
        return state, idx

    def setup_new_round(state, key, seed):
        """Refill the 5 factories (reference setup_new_round, :237-255).
        Returns (state, next_player_rel)."""

        def fill_factory(i, carry):
            state, key = carry
            s = _i32(state)
            bag_sum = jnp.sum(s[R_BAG, :5])
            low = bag_sum < 4
            n_draw = jnp.where(low, 4 - bag_sum, 4)
            # low-bag: factory takes the whole bag, bag <- discards
            state = jnp.where(
                low,
                state.at[R_FACT + i].set(state[R_BAG])
                     .at[R_BAG].set(state[R_DISC])
                     .at[R_DISC].set(jnp.zeros(6, jnp.int8)),
                state.at[R_FACT + i].set(jnp.zeros(6, jnp.int8)))

            def one(j, c):
                state, key = c
                key, k = jax.random.split(key)
                drawn, color = draw_one(state, k, seed)
                state = jnp.where(j < n_draw,
                                  drawn.at[R_FACT + i, color].add(1), state)
                return state, key

            return jax.lax.fori_loop(0, 4, one, (state, key))

        state, key = jax.lax.fori_loop(0, 5, fill_factory, (state, key))
        s = _i32(state)
        # first-player token decides who starts (reference :247-252)
        p1_has = s[R_PCOL + 1, 5] == 1
        nxt = jnp.where(p1_has, 1, 0).astype(jnp.int32)
        state = jnp.where(p1_has,
                          state.at[R_PCOL + 1, 5].set(0),
                          state.at[R_PCOL + 0, 5].set(0))
        state = state.at[R_SCORES, 2].add(1)
        state = state.at[R_CENTRE, 5].set(1)
        return state, nxt

    # ---------------- round scoring ----------------

    def _run_length(line, c):
        """Consecutive-1 run length through position c (line[c] == 1)."""
        idx = jnp.arange(line.shape[0])
        zero = line == 0
        last_zero_left = jnp.max(jnp.where((idx <= c) & zero, idx, -1))
        first_zero_right = jnp.min(
            jnp.where((idx >= c) & zero, idx, line.shape[0]))
        return first_zero_right - last_zero_left - 1

    def _score_change(wall, r, c):
        """Points for placing at (r,c) (reference score_change, :227-235)."""
        wall = wall.at[r, c].set(1)
        row = wall[r, :5]
        col = wall[:5, c]
        row_adj = (jnp.where(c > 0, row[jnp.maximum(c - 1, 0)], 0) == 1) | \
                  (jnp.where(c < 4, row[jnp.minimum(c + 1, 4)], 0) == 1)
        col_adj = (jnp.where(r > 0, col[jnp.maximum(r - 1, 0)], 0) == 1) | \
                  (jnp.where(r < 4, col[jnp.minimum(r + 1, 4)], 0) == 1)
        row_score = jnp.where(row_adj, _run_length(row, c), 0)
        col_score = jnp.where(col_adj, _run_length(col, r), 0)
        return jnp.where(~row_adj & ~col_adj, 1, row_score + col_score), wall

    def score_round(state):
        """Move completed pattern lines to walls with adjacency scoring,
        apply floor penalties (reference score_round, :169-190).  Placement
        order (player-major, row-minor) matters for adjacency — kept."""

        def place(k, state):
            k = jnp.asarray(k, jnp.int32)
            p, r = k // 5, k % 5
            s = _i32(state)
            complete = s[R_PRN + p, r] == r + 1
            color = s[R_PCOL + p, r]
            c = (color + r) % 5
            wall = jax.lax.dynamic_slice(
                s, (R_WALL + 5 * p, jnp.int32(0)), (5, 5))
            pts, new_wall = _score_change(wall, r, c)
            new_state = state
            new_state = new_state.at[R_SCORES, p].add(pts.astype(jnp.int8))
            new_state = jax.lax.dynamic_update_slice(
                new_state,
                jnp.pad(new_wall, ((0, 0), (0, 1))).astype(jnp.int8),
                (R_WALL + 5 * p, jnp.int32(0)))
            new_state = new_state.at[R_DISC, color].add(jnp.int8(r))
            new_state = new_state.at[R_PRN + p, r].set(0)
            new_state = new_state.at[R_PCOL + p, r].set(-1)
            return jnp.where(complete, new_state, state)

        state = jax.lax.fori_loop(0, 10, place, state)
        # floor penalties
        s = _i32(state)
        for p in range(2):
            pen = floor_penalty[jnp.minimum(s[R_PRN + p, 5], 7)]
            new = jnp.maximum(s[R_SCORES, p] - pen, 0)
            state = state.at[R_SCORES, p].set(new.astype(jnp.int8))
            state = state.at[R_PRN + p, 5].set(0)
        return state

    def _game_over(state):
        s = _i32(state)
        walls = s[R_WALL:R_WALL + 10, :5]
        return jnp.any(jnp.all(walls == 1, axis=1))

    def score_bonuses(state):
        """End bonuses: rows +2, columns +7, color diagonals +10
        (reference score_bonuses, :192-212)."""
        s = _i32(state)
        for p in range(2):
            wall = s[R_WALL + 5 * p:R_WALL + 5 * p + 5, :5]
            rows = jnp.sum(jnp.all(wall == 1, axis=1)) * 2
            cols = jnp.sum(jnp.all(wall == 1, axis=0)) * 7
            i, j = jnp.meshgrid(jnp.arange(5), jnp.arange(5), indexing="ij")
            # color i occupies cells (j, (j+i)%5)
            diag = jnp.sum(jnp.all(wall[j, (j + i) % 5] == 1, axis=1)) * 10
            state = state.at[R_SCORES, p].add(
                (rows + cols + diag).astype(jnp.int8))
        return state

    # ---------------- valid moves (reference valid_moves, :97-123) --------

    def valids(state):
        s = _i32(state)
        p = 0
        avail = jnp.concatenate(
            [s[R_CENTRE, :5][None] > 0,
             s[R_FACT:R_FACT + 5, :5] > 0])                 # (6,5)
        pc = s[R_PCOL + p]                                  # (6,)
        prn = s[R_PRN + p]
        line_free = (pc == -1).at[5].set(True)
        line_not_full = prn < jnp.arange(6) + 1
        colors = jnp.arange(5)
        # wall_free[color, line<5] = wall[line, (color+line)%5] == 0
        wall = s[R_WALL + 5 * p:R_WALL + 5 * p + 5, :5]
        li = jnp.arange(5)
        wf = wall[li[None, :], (colors[:, None] + li[None, :]) % 5] == 0
        wall_free = jnp.concatenate(
            [wf, jnp.ones((5, 1), bool)], axis=1)           # (5,6)
        line_correct = pc[None, :] == colors[:, None]       # (5,6)
        valid_lines = ((line_free[None] & wall_free)
                       | (line_correct & line_not_full[None]))  # (5,6)
        res = avail[:, :, None] & valid_lines[None]         # (6,5,6)
        return res.reshape(NUM_ACTIONS)

    # ---------------- make_move (reference :125-159) ----------------------

    def step(state, action, key, seed):
        p = 0
        action = jnp.asarray(action, jnp.int32)
        seed = jnp.asarray(seed, jnp.int32)
        s = _i32(state)
        fac = action // 30                    # 0 = centre
        color = (action % 30) // 6
        line = action % 6
        src = jnp.where(fac == 0, R_CENTRE, R_FACT + fac - 1)
        num = s[src, color]

        is_floor = line == 5
        line_c = jnp.minimum(line, 4)
        num_on = s[R_PRN + p, line_c]
        to_line = jnp.where(is_floor, 0,
                            jnp.minimum(line + 1 - num_on, num))
        to_floor = num - to_line

        state = state.at[R_PRN + p, line_c].add(
            jnp.where(is_floor, 0, to_line).astype(jnp.int8))
        state = state.at[R_PCOL + p, line_c].set(
            jnp.where(is_floor, state[R_PCOL + p, line_c],
                      color.astype(jnp.int8)))
        state = state.at[R_PRN + p, 5].add(to_floor.astype(jnp.int8))
        state = state.at[R_DISC, color].add(to_floor.astype(jnp.int8))
        state = state.at[src, color].set(0)

        # centre: maybe take the first-player token; factory: rest to centre
        has_token = _i32(state)[R_CENTRE, 5] == 1
        take_token = (fac == 0) & has_token
        from_centre = state \
            .at[R_PRN + p, 5].add(jnp.where(take_token, 1, 0).astype(jnp.int8)) \
            .at[R_PCOL + p, 5].set(jnp.where(take_token, 1,
                                             state[R_PCOL + p, 5])) \
            .at[R_CENTRE, 5].set(jnp.where(take_token, 0,
                                           state[R_CENTRE, 5]))
        fk = jnp.maximum(src, R_FACT)
        from_factory = state \
            .at[R_CENTRE].add(state[fk]) \
            .at[fk].set(jnp.zeros(6, jnp.int8))
        state = jnp.where(fac == 0, from_centre, from_factory)

        s = _i32(state)
        round_end = jnp.all(s[R_FACT:R_FACT + 5] == 0) & jnp.all(
            s[R_CENTRE, :5] == 0)

        def end_round(st):
            st = score_round(st)
            st, nxt = setup_new_round(st, key, seed)
            st = jnp.where(_game_over(st), score_bonuses(st), st)
            return st, nxt

        def mid_round(st):
            return st, jnp.int32(1)

        state, nxt = jax.lax.cond(round_end, end_round, mid_round, state)
        return state, nxt

    # ---------------- swap / terminal / misc -------------------------------

    def canonical(state, swap):
        k = swap % 2
        sw = state
        sw = sw.at[R_SCORES, 0].set(state[R_SCORES, 1])
        sw = sw.at[R_SCORES, 1].set(state[R_SCORES, 0])
        sw = sw.at[R_PCOL].set(state[R_PCOL + 1]) \
               .at[R_PCOL + 1].set(state[R_PCOL])
        sw = sw.at[R_PRN].set(state[R_PRN + 1]) \
               .at[R_PRN + 1].set(state[R_PRN])
        sw = sw.at[R_WALL:R_WALL + 5].set(state[R_WALL + 5:R_WALL + 10]) \
               .at[R_WALL + 5:R_WALL + 10].set(state[R_WALL:R_WALL + 5])
        return jnp.where(k == 1, sw, state)

    def terminal(state):
        """(reference check_end_game, :283-301)"""
        s = _i32(state)
        over = _game_over(state)
        sc0, sc1 = s[R_SCORES, 0], s[R_SCORES, 1]
        walls = s[R_WALL:R_WALL + 10, :5].reshape(2, 5, 5)
        row_totals = jnp.sum(jnp.all(walls == 1, axis=2), axis=1)
        p0 = (sc0 > sc1) | ((sc0 == sc1) & (row_totals[0] > row_totals[1]))
        p1 = (sc1 > sc0) | ((sc0 == sc1) & (row_totals[1] > row_totals[0]))
        res = jnp.where(p0, jnp.array([1.0, -1.0]),
                        jnp.where(p1, jnp.array([-1.0, 1.0]),
                                  jnp.array([0.01, 0.01])))
        return jnp.where(over, res, jnp.zeros(2)).astype(jnp.float32)

    def get_score(state, player):
        return state[R_SCORES, player].astype(jnp.float32)

    def get_round(state):
        return state[R_SCORES, 2].astype(jnp.int32)

    def init(key):
        state = jnp.zeros((23, 6), jnp.int8)
        state = state.at[R_BAG, :5].set(20)
        state = state.at[R_PCOL:R_PCOL + 2, :5].set(-1)
        state, _ = setup_new_round(state, key, jnp.int32(0))
        return state

    def observe(state):
        return state.astype(jnp.float32)

    # ---------------- symmetries (reference get_symmetries, :310-331) -----

    row_perms = []
    act_perms = []
    for perm in _FACTORY_PERMS:
        rp = np.arange(23)
        ap = np.arange(NUM_ACTIONS)
        for i, q in enumerate(perm.astype(np.int64)):
            rp[R_FACT + i] = R_FACT + q
            ap[30 * (i + 1):30 * (i + 2)] = np.arange(30 * (q + 1),
                                                      30 * (q + 2))
        row_perms.append(rp)
        act_perms.append(ap)
    sym_rows = jnp.asarray(np.stack(row_perms), jnp.int32)
    sym_acts = jnp.asarray(np.stack(act_perms), jnp.int32)
    num_symmetries = len(row_perms)  # 120 (identity is perm (0,1,2,3,4))

    def symmetries(state, pi, valid):
        return state[sym_rows], pi[sym_acts], valid[sym_acts]

    return GameSpec(
        name="azul_2p",
        num_players=2,
        state_shape=(23, 6),
        obs_shape=(23, 6),
        num_actions=NUM_ACTIONS,
        max_game_length=360,
        init=init,
        valids=valids,
        step=step,
        canonical=canonical,
        terminal=terminal,
        observe=observe,
        get_round=get_round,
        get_score=get_score,
        symmetries=symmetries,
        num_symmetries=num_symmetries,
        meta=AzulMeta(num_players=2),
    )
