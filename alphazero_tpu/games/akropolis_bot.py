"""Akropolis "Undefeated Strategy" scripted bot.

Faithful reimplementation of the reference's benchmark opponent
(/root/reference/akropolis/AkropolisPlayers.py:67-497): a deterministic
planner that builds a 4-level pyramid above the start tile.  It enumerates
the 8 possible pyramid placements ("universes"), scores every action with a
priority-rule cascade (non-blue plazas onto scoring positions first, pile
blue districts/quarries outside the pyramid, rotate non-blue districts onto
scoring positions, ...), prunes universes that the chosen action
contradicts, and tie-breaks by the post-move score.

The reference reports its trained nets winning ~75+% against this strategy
(README.md:80-86) — it is the external baseline for Akropolis strength.

Host-side numpy: it plays ONE game at a time through the `Player` protocol
(state, key, move_number) -> action, tracking universe beliefs across calls.
"""

from __future__ import annotations

from copy import deepcopy

import numpy as np
import jax
import jax.numpy as jnp

from alphazero_tpu.games.akropolis import (
    CITY_SIZE, N_ORIENTS, PATTERNS, TILES_DATA, _DIR_EVEN, _DIR_ODD,
    EMPTY, QUARRY, D_BLUE, D_YELLOW, D_RED, D_PURPLE, D_GREEN,
    P_YELLOW, P_RED, P_PURPLE, P_GREEN)

# ---------------------------------------------------------------------------
# pyramid universes (reference AkropolisPlayers.py:74-144)
# ---------------------------------------------------------------------------

_LVL1_TILES = [
    {(4, 7), (5, 6), (5, 7)},
    {(7, 4), (6, 5), (6, 4)},
    {(4, 4), (5, 3), (5, 4)},
    {(7, 2), (6, 2), (6, 3)},
    {(4, 2), (4, 3), (5, 2)},
]


def _level_pyramid(leftest, n_tiles):
    r0, q0 = leftest
    tiles = []
    for _ in range(n_tiles):
        if r0 % 2 == 0:
            tiles.append({(r0, q0), (r0 - 1, q0), (r0, q0 + 1)})
            r0, q0 = r0 - 1, q0 + 1
        else:
            tiles.append({(r0, q0), (r0 + 1, q0 + 1), (r0, q0 + 1)})
            r0, q0 = r0 + 1, q0 + 2
    return tiles


def _compute_all(acc, universe, idx, leftest, n_tiles):
    u = deepcopy(universe)
    u.append(_level_pyramid(leftest, n_tiles))
    if n_tiles <= 1:
        acc[idx] = u
        return acc, idx + 1
    r, q = leftest
    nxt = [(r - 1, q), (r, q + 1)] if r % 2 == 0 else \
        [(r + 1, q + 1), (r, q + 1)]
    for nl in nxt:
        acc, idx = _compute_all(acc, u, idx, nl, n_tiles - 1)
    return acc, idx


def _scoring_positions(universes):
    result = {}
    for i, u in universes.items():
        by_level = []
        for level in range(len(u) - 1):
            cur = {c for t in u[level] for c in t}
            upper = {c for t in u[level + 1] for c in t}
            by_level.append(cur - upper)
        by_level.append({c for t in u[-1] for c in t})
        result[i] = by_level
    return result


ALL_UNIVERSES, N_UNIVERSES = _compute_all({}, [[], _LVL1_TILES], 0, (6, 2), 4)
ALL_SP = _scoring_positions(ALL_UNIVERSES)

_NBP = {P_RED, P_YELLOW, P_PURPLE, P_GREEN}
_NBD = {D_RED, D_YELLOW, D_PURPLE, D_GREEN}
_RULE1A = {P_GREEN: 4, P_RED: 3, P_PURPLE: 2, P_YELLOW: 1}
_NBD_ROT = {D_GREEN: 30, D_RED: 10, D_YELLOW: 3, D_PURPLE: 1}
_N_SP_PRIORITY = [
    (0, 3, 0), (0, 2, 0), (0, 2, 1), (0, 1, 2), (0, 1, 1), (0, 1, 0),
    (0, 0, 2), (0, 0, 1), (0, 0, 0), (1, 3, 1), (1, 2, 1), (1, 2, 2),
    (1, 2, 1), (1, 1, 2), (1, 1, 1), (2, 2, 2), (2, 3, 2),
]


def _neigh_it(r, q):
    dirs = _DIR_EVEN if (r & 1) == 0 else _DIR_ODD
    for dq, dr in dirs:
        nr, nq = r + dr, q + dq
        if 0 <= nr < CITY_SIZE and 0 <= nq < CITY_SIZE:
            yield nr, nq


class _BoardView:
    """Player-0 views of the canonical Akropolis state (games/akropolis.py
    layout == reference layout)."""

    def __init__(self, state: np.ndarray, num_players: int):
        n = num_players
        self.descr = state[:, :, 0]
        self.height = state[:, :, n]
        self.cs = state[:n + 2, 0:4, 3 * n + 1]
        self.stones0 = int(state[2 * n, 1, 3 * n])
        self.round = int(state[n + 3, 0, 3 * n + 1])   # misc row = cs_size+1
        self.cs_size = n + 2


def _would_create_new_tileslot(bv, coords, coord_set, tile_descr):
    """reference :174-212 — can this out-of-pyramid tile seed a future slot,
    and how many quarries / blue districts would sit under it?"""
    best = (0, 0)
    for cand in range(PATTERNS.shape[0]):
        if PATTERNS[cand, 0] < 0:
            continue
        cset = {divmod(int(i), CITY_SIZE) for i in PATTERNS[cand]}
        common = cset & coord_set
        only = cset - coord_set
        if not common or not only:
            continue
        h = bv.height[next(iter(common))] + 1
        if any(bv.height[c] > h for c in only):
            continue
        pyr0 = ALL_UNIVERSES[0][h + 1] if h + 1 < len(ALL_UNIVERSES[0]) \
            else []
        if not all(cset.isdisjoint(t) for t in pyr0):
            continue
        n_q = sum(bv.descr[c] == QUARRY for c in only)
        n_bd = sum(bv.descr[c] == D_BLUE for c in only)
        n_q += sum(1 for c in common
                   if tile_descr[coords.index(c)] == QUARRY)
        n_bd += sum(1 for c in common
                    if tile_descr[coords.index(c)] == D_BLUE)
        best = max(best, (n_q, n_bd))
    return best


def _action_features(bv, action, universe_idx):
    """reference action_features_per_universe (:214-327)."""
    tile_idx, pattern_idx = divmod(action, CITY_SIZE * CITY_SIZE * N_ORIENTS)
    tile_id = int(bv.cs[tile_idx, 3])
    tile_descr = [int(x) for x in TILES_DATA[tile_id, :3]]

    has_nbp = any(h in _NBP for h in tile_descr)
    n_nbd = sum(h in _NBD for h in tile_descr)
    is_free_tile = tile_idx == 0
    rule1a_priority = sum(_RULE1A.get(h, 0) for h in tile_descr)

    coords = [divmod(int(i), CITY_SIZE) for i in PATTERNS[pattern_idx]]
    coord_set = frozenset(coords)
    level = int(bv.height[coords[0]])
    u = ALL_UNIVERSES[universe_idx]
    pyr_level = u[level + 1] if level + 1 < len(u) else []
    sp_level = ALL_SP[universe_idx][level + 1] \
        if level + 1 < len(ALL_SP[universe_idx]) else set()

    is_in_pyramid = coord_set in pyr_level
    is_out_pyramid = all(coord_set.isdisjoint(t) for t in pyr_level)
    n_hex_on_sp = sum(1 for c in coords if c in sp_level)
    rightmost = max(c[1] for c in coords) if n_hex_on_sp == 0 else 0
    idx_in_pyr = min(pyr_level.index(coord_set), 3) if is_in_pyramid else 3
    rev_idx_lvl0 = 3 - idx_in_pyr if level == 0 else 0

    yd_on_sp = [c for h, c in zip(tile_descr, coords)
                if c in sp_level and h == D_YELLOW]
    hex_on_sp = [h for h, c in zip(tile_descr, coords) if c in sp_level]

    n_pd_surrounded = sum(
        1 for c in coords if bv.descr[c] == EMPTY
        for nb in _neigh_it(*c) if bv.descr[nb] == D_PURPLE)
    n_rd_full = 0
    for r in range(CITY_SIZE):
        for q in range(CITY_SIZE):
            if bv.descr[r, q] == D_RED:
                if all(bv.descr[nb] != EMPTY or nb in coords
                       for nb in _neigh_it(r, q)):
                    n_rd_full += 1
    if is_out_pyramid and has_nbp:
        n_q_under, n_bd_under = _would_create_new_tileslot(
            bv, coords, coord_set, tile_descr)
    else:
        n_q_under, n_bd_under = 0, 0

    rule1b_priority = (300 * n_pd_surrounded
                       + 50 * max(0, 2 - n_rd_full)
                       + 10 * n_q_under + n_bd_under)
    n_nbd_on_sp = sum(1 for h in hex_on_sp if h in _NBD)
    nbd_rotation_priority = sum(_NBD_ROT.get(h, 0) for h in hex_on_sp)
    n_sp_priority_new = _N_SP_PRIORITY.index(
        (n_nbd_on_sp, n_hex_on_sp, n_nbd))
    has_nbp_on_sp = any(h in _NBP for h in hex_on_sp)
    cover_bdq = all(bv.descr[c] in (D_BLUE, QUARRY) for c in coords)
    has_adjacent_yd_on_sp = any(
        bv.descr[nb] == D_YELLOW and
        nb in ALL_SP[universe_idx][int(bv.height[nb])]
        for c in yd_on_sp for nb in _neigh_it(*c))

    buyable = [int(bv.cs[i, 3]) for i in
               range(min(bv.cs_size, bv.stones0 + 1))]
    pyr_hexes = {h for lvl in range(5) for t in u[lvl] for h in t}
    pyr_hexes.add((7, 5))
    max_nbd_buyable = max(
        sum(1 for h in TILES_DATA[tid, :3] if int(h) in _NBD)
        for tid in buyable)
    glob_out = sum(int(bv.height[r, q])
                   for r in range(CITY_SIZE) for q in range(CITY_SIZE)
                   if (r, q) not in pyr_hexes)

    return dict(
        has_nbp=has_nbp, n_nbd=n_nbd, is_free_tile=is_free_tile,
        rule1a_priority=rule1a_priority, level=level,
        rightmost_priority_for_0sp=rightmost, is_in_pyramid=is_in_pyramid,
        is_out_pyramid=is_out_pyramid,
        reverse_index_in_pyramid_lvl0=rev_idx_lvl0,
        n_hex_on_sp=n_hex_on_sp, cover_BD_and_Q_only=cover_bdq,
        rule1b_priority=rule1b_priority,
        nbd_rotation_priority=nbd_rotation_priority,
        n_sp_priority_new=n_sp_priority_new,
        has_adjacent_yd_on_sp=has_adjacent_yd_on_sp,
        has_nbp_on_sp=has_nbp_on_sp, n_nbd_on_sp=n_nbd_on_sp,
        max_nbd_in_buyable_tiles=max_nbd_buyable,
        glob_hexes_out_of_pyramid=glob_out)


def _categorize_core(f):
    """Priority-rule cascade (reference _categorize_core, :385-431)."""
    if f["has_adjacent_yd_on_sp"]:
        return -10
    if f["has_nbp"]:
        if f["is_in_pyramid"] and f["has_nbp_on_sp"] and f["level"] <= 1:
            return (500000 + 10000 * (1 - f["level"])
                    + 100 * f["n_sp_priority_new"]
                    + 10 * f["rule1a_priority"]
                    + f["reverse_index_in_pyramid_lvl0"])
        if f["is_out_pyramid"] and f["glob_hexes_out_of_pyramid"] <= 6:
            if f["level"] >= 1 and f["cover_BD_and_Q_only"]:
                return 410000
            if f["level"] == 0:
                return 400000 + f["rule1b_priority"]
        if f["is_in_pyramid"] and f["has_nbp_on_sp"]:
            if f["n_nbd"] >= f["max_nbd_in_buyable_tiles"] \
                    and f["level"] >= 3:
                return (350000 + 1000 * f["n_sp_priority_new"]
                        + f["rule1a_priority"])
            if f["level"] == 3:
                return (300000 + 1000 * f["n_sp_priority_new"]
                        + f["rule1a_priority"])
    if f["is_in_pyramid"]:
        if f["n_nbd_on_sp"] >= 2 and f["level"] >= 1:
            return 290000
        if f["is_free_tile"] and f["level"] >= 1 and f["n_nbd"] >= 1:
            return (200000 + 1000 * f["n_sp_priority_new"]
                    + 10 * f["nbd_rotation_priority"]
                    + f["rightmost_priority_for_0sp"])
        if f["is_free_tile"] and f["level"] >= 1 and f["n_hex_on_sp"] == 0:
            return 190000 + f["rightmost_priority_for_0sp"]
        if f["n_nbd"] >= 1:
            return (100000 + 50000 * (1 if f["level"] >= 1 else 0)
                    + 1000 * f["n_sp_priority_new"]
                    + 10 * f["nbd_rotation_priority"]
                    + f["reverse_index_in_pyramid_lvl0"]
                    + f["rightmost_priority_for_0sp"])
        if f["is_free_tile"]:
            return (0 + 100 * (1 if f["level"] >= 1 else 0)
                    + 10 * (3 - f["n_hex_on_sp"])
                    + f["reverse_index_in_pyramid_lvl0"]
                    + f["rightmost_priority_for_0sp"])
    return 0


import functools


@functools.lru_cache(maxsize=None)
def _bot_fns(spec, platform):
    """Shared jitted valids/step for all bot instances of one spec —
    per-instance jits would retrace once per arena lane.  platform (e.g.
    'cpu') pins execution there: the bot's per-candidate lookahead calls are
    latency-bound, and on a tunneled TPU each round-trip costs ~10 ms while
    the in-process CPU answers immediately (and leaves the TPU to the
    batched net searches running alongside)."""
    dev = jax.devices(platform)[0] if platform else None
    put = (lambda x: jax.device_put(x, dev)) if dev is not None \
        else (lambda x: jnp.asarray(x))
    valids = jax.jit(spec.valids)
    # non-canonical step: the mover stays player 0 so get_score(., 0)
    # reads the mover's score (reference getNextState does not swap)

    def _step_score(s, a):
        nxt = spec.step(s, a, jax.random.PRNGKey(0), jnp.int32(7))[0]
        return nxt, spec.get_score(nxt, jnp.int32(0))

    step_score = jax.jit(_step_score)
    return (lambda s: valids(put(s))), \
        (lambda s, a: step_score(put(s), a))


class UndefeatedPlayer:
    """The scripted strategy through our Player protocol."""

    def __init__(self, spec, platform=None):
        assert spec.name.startswith("akropolis")
        self.spec = spec
        self.n = spec.num_players
        self.possible_universes = list(range(N_UNIVERSES))
        self._valids, self._step = _bot_fns(spec, platform)

    def _update_universes(self, bv, action):
        tile_idx, pattern_idx = divmod(action,
                                       CITY_SIZE * CITY_SIZE * N_ORIENTS)
        coords = [divmod(int(i), CITY_SIZE) for i in PATTERNS[pattern_idx]]
        coord_set = frozenset(coords)
        level = int(bv.height[coords[0]]) + 1
        for u_idx in self.possible_universes[:]:
            u = ALL_UNIVERSES[u_idx]
            pyr = u[level] if level < len(u) else []
            if coord_set not in pyr and \
                    any(not coord_set.isdisjoint(t) for t in pyr):
                self.possible_universes.remove(u_idx)
        if not self.possible_universes:
            self.possible_universes = list(range(N_UNIVERSES))
            return
        tile_id = int(bv.cs[tile_idx, 3])
        tile_descr = [int(x) for x in TILES_DATA[tile_id, :3]]
        imp = [c for h, c in zip(tile_descr, coords)
               if h in _NBD or h in _NBP]
        metric = []
        for u_idx in self.possible_universes:
            sp = ALL_SP[u_idx][level] if level < len(ALL_SP[u_idx]) else set()
            nios = sum(1 for c in imp if c in sp)
            nhos = sum(1 for c in coords if c in sp)
            metric.append(10 * nios - nhos)
        best = max(metric)
        self.possible_universes = [
            u for u, m in zip(self.possible_universes, metric) if m == best]

    def categorize(self, state):
        """(best_actions, best_category) — reference _categorize (:433-465)."""
        bv = _BoardView(np.asarray(state), self.n)
        v = np.asarray(self._valids(state))
        best_actions, best_cat = [], -100
        for a in np.flatnonzero(v):
            cat_a = max(_categorize_core(_action_features(bv, int(a), u))
                        for u in self.possible_universes)
            if cat_a > best_cat:
                best_actions, best_cat = [int(a)], cat_a
            elif cat_a == best_cat:
                best_actions.append(int(a))
        return best_actions, best_cat

    def score_filter(self, state, actions):
        """Keep the actions maximizing the mover's post-move score."""
        scores = [float(self._step(state, jnp.int32(a))[1])
                  for a in actions]
        mx = max(scores)
        return [a for a, sc in zip(actions, scores) if sc == mx]

    def observe_move(self, state, action):
        """Update universe beliefs after the chosen action."""
        self._update_universes(_BoardView(np.asarray(state), self.n), action)

    def __call__(self, state, key, move_number):
        bv = _BoardView(np.asarray(state), self.n)
        if bv.round < self.n:
            self.possible_universes = list(range(N_UNIVERSES))
        best_actions, _ = self.categorize(state)
        best_actions = self.score_filter(state, best_actions)
        pick = int(jax.random.choice(key, jnp.asarray(best_actions)))
        self.observe_move(state, pick)
        return pick
