"""Santorini — TPU-native vectorized engine.

Behavioral reference: /root/reference/santorini/SantoriniLogicNumba.py (Board
jitclass, 729 LoC) and /root/reference/santorini/SantoriniConstants.py.  This
is a from-scratch pure-functional JAX implementation of the same rules: no
Python loops over cells/directions — validity of all (worker, move, build)
combinations is computed as one broadcasted tensor expression so thousands of
boards step in lockstep under vmap+jit.

State (5,5,3) int8, canonical (player to move = "positive" player):
  ch 0: workers (+1,+2 current player, -1,-2 opponent)
  ch 1: building levels 0..4 (4 = dome)
  ch 2 (flattened to 25 cells): god-power bitfields, cells [0,NB_GODS) for the
        current player, [NB_GODS,2*NB_GODS) for the opponent, cell 2*NB_GODS =
        round counter (see reference lines 21-30).

Action encoding (reference SantoriniConstants.py:24-34):
  a = worker*NB_GODS*81 + god*81 + move_dir*9 + build_dir, dirs in a 3x3
  pattern with 4 = "no move/build".

Variant flags (module constants in the reference; config here):
  nb_gods:      1 disables god powers (reference NB_GODS,
                SantoriniConstants.py:19).  God powers land in a later round.
  init_method:  0 = predefined worker placement, 1 = random placement
                (reference INIT_METHOD, SantoriniLogicNumba.py:7-11).
                NOTE: the reference's INIT_METHOD=0 path never sets the NO_GOD
                power flag, which its own valid-move dispatch requires
                (SantoriniLogicNumba.py:135); we set it at init so the
                deterministic variant is actually playable.  The parity test
                oracle is patched identically.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from alphazero_tpu.games.base import GameSpec

# God identifiers (reference SantoriniConstants.py:8-19).
NO_GOD, APOLLO, MINOTAUR, ATLAS, HEPHAESTUS = 0, 1, 2, 3, 4
ARTEMIS, DEMETER, HERMES, PAN, ATHENA, PROMETHEUS = 5, 6, 7, 8, 9, 10
NO_MOVE = 4
NO_BUILD = 4
MAX_ITER_FOR_HERMES = 5  # reference SantoriniConstants.py:7

# Direction index d in 0..8 maps to (dy, dx) = (d//3 - 1, d%3 - 1)
# (reference SantoriniLogicNumba.py:56-70).
_DIRS_NP = np.array([[d // 3 - 1, d % 3 - 1] for d in range(9)], dtype=np.int32)

# ---------------------------------------------------------------------------
# Symmetry permutation tables (reference SantoriniConstants.py:37-79).
# The reference applies permutations in scatter form (new[perm[i]] = old[i]);
# we precompute the corresponding gather indices (new = old[g]).
# ---------------------------------------------------------------------------

_ROT_CORE = np.array([6, 3, 0, 7, 4, 1, 8, 5, 2], dtype=np.int64)   # 90° CCW
_FLIPLR_CORE = np.array([2, 1, 0, 5, 4, 3, 8, 7, 6], dtype=np.int64)
_FLIPUD_CORE = np.array([6, 7, 8, 3, 4, 5, 0, 1, 2], dtype=np.int64)


def _action_perm(core: np.ndarray, nb_gods: int) -> np.ndarray:
    """Scatter permutation of the action space induced by a direction perm."""
    n = nb_gods * 2 * 81
    a = np.arange(n)
    worker, rest = np.divmod(a, nb_gods * 81)
    god, rest = np.divmod(rest, 81)
    m, b = np.divmod(rest, 9)
    return worker * nb_gods * 81 + god * 81 + core[m] * 9 + core[b]


def _inv(perm: np.ndarray) -> np.ndarray:
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return inv


@dataclasses.dataclass(frozen=True)
class SantoriniMeta:
    nb_gods: int
    init_method: int


def make_santorini(num_players: int = 2, nb_gods: int = 1,
                   init_method: int = 0) -> GameSpec:
    """Build the Santorini GameSpec.  nb_gods=1 => no god powers."""
    if num_players != 2:
        raise ValueError("Santorini is a 2-player game")
    if nb_gods not in (1, 11):
        raise ValueError("nb_gods must be 1 (no powers) or 11 (all gods)")
    if init_method not in (0, 1):
        raise ValueError("init_method must be 0 (predefined) or 1 (random)")

    num_actions = nb_gods * 2 * 81
    round_cell = 2 * nb_gods  # flat index of the round counter in channel 2

    dirs = jnp.asarray(_DIRS_NP)

    # --- symmetry gather tables -------------------------------------------
    rot_g = _inv(_action_perm(_ROT_CORE, nb_gods))
    rot_g2 = rot_g[rot_g]
    rot_g3 = rot_g2[rot_g]
    fliplr_g = _inv(_action_perm(_FLIPLR_CORE, nb_gods))
    flipud_g = _inv(_action_perm(_FLIPUD_CORE, nb_gods))
    half = num_actions // 2
    swapw_g = np.concatenate([np.arange(half, num_actions), np.arange(half)])
    ident_g = np.arange(num_actions)
    # order matches reference get_symmetries (SantoriniLogicNumba.py:578-653):
    # identity, rot90, rot180, rot270, flipLR, flipUD, swap own workers,
    # swap opponent workers.
    action_gathers = jnp.asarray(
        np.stack([ident_g, rot_g, rot_g2, rot_g3, fliplr_g, flipud_g,
                  swapw_g, ident_g]), dtype=jnp.int32)
    num_symmetries = 8

    # --- helpers -----------------------------------------------------------

    def _planes(state):
        workers = state[:, :, 0].astype(jnp.int32)
        levels = state[:, :, 1].astype(jnp.int32)
        gods = state[:, :, 2].reshape(25).astype(jnp.int32)
        return workers, levels, gods

    def _worker_yx(workers, wid):
        flat = jnp.argmax((workers.reshape(25) == wid).astype(jnp.int32))
        return jnp.stack([flat // 5, flat % 5])

    def _at(plane, yx):
        """Gather plane[y, x] for trailing-dim-2 index arrays, clipped."""
        c = jnp.clip(yx, 0, 4)
        return plane[c[..., 0], c[..., 1]]

    def _in_grid(yx):
        return jnp.all((yx >= 0) & (yx <= 4), axis=-1)

    # --- valid moves (reference Board.valid_moves, lines 125-432) ----------

    # Dense (gather-free) valids: TPU gathers with per-board dynamic indices
    # are slow, so every "value at cell + dir" becomes a static roll of the
    # whole plane and the per-worker extraction a masked any-reduction.
    _ingrid_np = np.zeros((9, 5, 5), bool)
    for _d in range(9):
        _dy, _dx = _DIRS_NP[_d]
        ys, xs = np.mgrid[0:5, 0:5]
        _ingrid_np[_d] = ((ys + _dy >= 0) & (ys + _dy <= 4)
                          & (xs + _dx >= 0) & (xs + _dx <= 4))
    ingrid9 = jnp.asarray(_ingrid_np)

    def _shift9(x, fill):
        """(..., 5, 5) -> (9, ..., 5, 5): value at cell + dir_d (OOB: fill)."""
        outs = []
        for d in range(9):
            dy, dx = int(_DIRS_NP[d, 0]), int(_DIRS_NP[d, 1])
            r = jnp.roll(x, (-dy, -dx), axis=(-2, -1))
            pad = (1,) * (x.ndim - 2)
            outs.append(jnp.where(ingrid9[d].reshape(pad + (5, 5)), r, fill))
        return jnp.stack(outs)

    def _valids_tensor(state):
        """(2, 9, 9) validity of (worker, move_dir, build_dir) — NO_GOD rules
        (reference lines 135-151)."""
        workers, levels, _ = _planes(state)
        onehot = jnp.stack([workers == 1, workers == 2])   # (2,5,5)
        sw = _shift9(workers, 9)                           # (9,5,5)
        sl = _shift9(levels, 9)
        dir_ids = jnp.arange(9)

        # from cell c, moving in direction m (worker stands at c)
        move = (ingrid9 & (dir_ids != NO_MOVE)[:, None, None]
                & (sw == 0) & (sl <= 3)
                & (sl <= levels[None] + 1))                # (9,5,5)
        # from cell t, building in direction b for worker wid
        wid = jnp.array([1, 2])[:, None, None, None]
        build = (ingrid9[None] & (dir_ids != NO_BUILD)[None, :, None, None]
                 & ((sw[None] == 0) | (sw[None] == wid))
                 & (sl[None] < 4))                         # (2,9,5,5)
        bshift = _shift9(build, False)                     # (9,2,9,5,5)

        comb = (onehot[None, :, None]                      # (1,2,1,5,5)
                & move[:, None, None]                      # (9,1,1,5,5)
                & bshift)                                  # (9,2,9,5,5)
        out = jnp.any(comb, axis=(-2, -1))                 # (m,w,b)
        return jnp.transpose(out, (1, 0, 2))               # (2,9,9)

    def valids(state):
        # nb_gods == 1: the only god slot is NO_GOD, so (2,9,9) == action space.
        return _valids_tensor(state).reshape(num_actions)

    # --- make_move (reference Board.make_move, lines 434-550) --------------

    def step(state, action, key, seed):
        del key, seed  # no chance nodes in no-gods Santorini moves
        action = jnp.asarray(action, jnp.int32)
        workers, levels, gods = _planes(state)
        rest = action % (nb_gods * 81)
        w = action // (nb_gods * 81)
        rest2 = rest % 81
        m, b = rest2 // 9, rest2 % 9
        wid = w + 1

        pos = jnp.where(wid == 1, _worker_yx(workers, 1), _worker_yx(workers, 2))
        new = pos + dirs[m]
        workers = workers.at[pos[0], pos[1]].set(0)
        workers = workers.at[new[0], new[1]].set(wid)
        bp = jnp.clip(new + dirs[b], 0, 4)
        levels = levels.at[bp[0], bp[1]].add(
            jnp.where(b != NO_BUILD, 1, 0).astype(levels.dtype))

        # reset current player's transient god info (reference lines 473-476)
        own = jnp.arange(25) < nb_gods
        gods = jnp.where(own, jnp.minimum(64, gods), gods)
        # round counter, saturating at 127 (reference lines 543-545)
        gods = gods.at[round_cell].add(
            jnp.where(gods[round_cell] < 127, 1, 0).astype(gods.dtype))

        nxt = jnp.stack([workers.astype(jnp.int8), levels.astype(jnp.int8),
                         gods.reshape(5, 5).astype(jnp.int8)], axis=-1)
        swap = jnp.int32(1)  # no play-again without god powers
        return nxt, swap

    # --- god-powers variant (nb_gods == 11) ----------------------------------
    # Reference valid_moves god dispatch (SantoriniLogicNumba.py:125-432) and
    # make_move powers (:434-550).  Gather-based (2 workers, tiny tensors) —
    # the no-gods flagship keeps the dense fast path above.

    def _valids_gods(state):
        s = state.astype(jnp.int32)
        workers, levels = s[:, :, 0], s[:, :, 1]
        gods = s[:, :, 2].reshape(25)
        own = gods[:nb_gods]
        opp = gods[nb_gods:2 * nb_gods]
        own_god = jnp.argmax(own > 0)
        climb = jnp.where(opp[ATHENA] > 64, 0, 1)

        pos = jnp.stack([_worker_yx(workers, 1), _worker_yx(workers, 2)])
        wid = jnp.array([1, 2], jnp.int32)
        lvl_old = _at(levels, pos)                          # (2,)
        m_ids = jnp.arange(9)
        newpos = pos[:, None, :] + dirs[None]               # (2,9,2)
        ingrid = _in_grid(newpos)
        wn = _at(workers, newpos)
        ln = _at(levels, newpos)
        not_dome = ln <= 3
        climb_ok = ln <= lvl_old[:, None] + climb
        move_n = ((m_ids != NO_MOVE)[None] & ingrid & (wn == 0)
                  & not_dome & climb_ok)                    # (2,9)
        move_noclimb = ((m_ids != NO_MOVE)[None] & ingrid & (wn == 0)
                        & not_dome & (ln <= lvl_old[:, None]))
        swap_mv = ((m_ids != NO_MOVE)[None] & ingrid & (wn < 0)
                   & not_dome & climb_ok)
        pushpos = newpos + dirs[None]                       # (2,9,2)
        ppin = _in_grid(pushpos)
        push_ok = ppin & (_at(workers, pushpos) == 0) \
            & (_at(levels, pushpos) <= 3)
        push_mv = swap_mv & push_ok
        same_lvl_mv = move_n & (ln == lvl_old[:, None])

        b_ids = jnp.arange(9)
        bp = newpos[:, :, None, :] + dirs[None, None]       # (2,9,9,2)
        bin_ = _in_grid(bp)
        wb = _at(workers, bp)
        lb = _at(levels, bp)
        free_b = (wb == 0) | (wb == wid[:, None, None])
        bmask = (b_ids != NO_BUILD)[None, None]
        build_n = bmask & bin_ & free_b & (lb < 4)          # (2,9,9)
        build_dome = bmask & bin_ & free_b & (lb < 3)
        build_two = bmask & bin_ & free_b & (lb < 2)
        build_old = build_n[:, NO_MOVE]                     # (2,9) from pos

        normal = move_n[:, :, None] & build_n               # (2,9,9)
        Z = jnp.zeros((2, nb_gods, 9, 9), bool)

        def with_col(V, col, tens):
            return V.at[:, col].set(tens)

        def b_plain():
            return with_col(Z, NO_GOD, normal)

        def b_apollo():
            V = with_col(Z, NO_GOD, normal)
            alt = (swap_mv & ~move_n)[:, :, None] & build_n
            return with_col(V, APOLLO, alt)

        def b_minotaur():
            V = with_col(Z, NO_GOD, normal)
            alt = (push_mv & ~move_n)[:, :, None] & build_n
            return with_col(V, MINOTAUR, alt)

        def b_atlas():
            V = with_col(Z, NO_GOD, normal)
            return with_col(V, ATLAS, move_n[:, :, None] & build_dome)

        def b_hephaestus():
            V = with_col(Z, NO_GOD, normal)
            return with_col(V, HEPHAESTUS, move_n[:, :, None] & build_two)

        def b_artemis():
            data = own[ARTEMIS] % 64 - 1
            wf, avoid = data // 9, data % 9
            V1 = with_col(Z, NO_GOD, normal)
            V1 = V1.at[:, ARTEMIS, :, NO_BUILD].set(move_n)
            wmask = (jnp.arange(2) == wf)[:, None, None]
            V2 = with_col(Z, NO_GOD, normal & wmask
                          & (m_ids != avoid)[None, :, None])
            return jnp.where(data < 0, V1, V2)

        def b_demeter():
            data = own[DEMETER] % 64 - 1
            wf, avoid = data // 9, data % 9
            V1 = with_col(Z, DEMETER, normal)
            col = build_old & (b_ids != avoid)[None]        # (2,9)
            col = col | (b_ids == NO_BUILD)[None]           # cancel 2nd turn
            wmask = jnp.arange(2) == wf
            V2 = Z.at[:, NO_GOD, NO_MOVE, :].set(col & wmask[:, None])
            return jnp.where(data < 0, V1, V2)

        def b_hermes():
            cnt = own[HERMES] % 64
            V = Z.at[:, NO_GOD, NO_MOVE, :].set(build_old)
            V = V.at[:, HERMES, :, NO_BUILD].set(
                same_lvl_mv & (cnt < MAX_ITER_FOR_HERMES))
            return V.at[:, NO_GOD].set(
                V[:, NO_GOD] | (normal & (cnt == 0)))

        def b_prometheus():
            data = own[PROMETHEUS] % 64 - 1
            wf = data // 9
            V1 = with_col(Z, NO_GOD, normal)
            V1 = V1.at[:, PROMETHEUS, NO_MOVE, :].set(build_old)
            wmask = (jnp.arange(2) == wf)[:, None, None]
            V2 = with_col(Z, NO_GOD,
                          (move_noclimb[:, :, None] & build_n) & wmask)
            return jnp.where(data < 0, V1, V2)

        V = jax.lax.switch(
            own_god,
            [b_plain, b_apollo, b_minotaur, b_atlas, b_hephaestus,
             b_artemis, b_demeter, b_hermes, b_plain, b_plain,
             b_prometheus])
        # (worker, god, move, build) -> action index layout
        return V.reshape(num_actions)

    def _step_gods(state, action, key, seed):
        del key, seed
        action = jnp.asarray(action, jnp.int32)
        s = state.astype(jnp.int32)
        workers, levels = s[:, :, 0], s[:, :, 1]
        gods = s[:, :, 2].reshape(25)

        w = action // (nb_gods * 81)
        g = (action % (nb_gods * 81)) // 81
        m = (action % 81) // 9
        b = action % 9
        wid = w + 1

        old = jnp.where(wid == 1, _worker_yx(workers, 1),
                        _worker_yx(workers, 2))
        new = jnp.clip(old + dirs[m], 0, 4)
        bp = jnp.clip(new + dirs[b], 0, 4)
        bp_old = jnp.clip(old + dirs[b], 0, 4)
        old_lvl = levels[old[0], old[1]]

        def move_build(wk, lv, delta):
            wk = wk.at[old[0], old[1]].set(0).at[new[0], new[1]].set(wid)
            lv = lv.at[bp[0], bp[1]].add(
                jnp.where(b != NO_BUILD, delta, 0))
            return wk, lv

        def g_nogod(wk, lv, gd):
            wk, lv = move_build(wk, lv, 1)
            new_lvl = lv[new[0], new[1]]
            has_pan = gd[PAN] > 0
            has_ath = gd[ATHENA] > 0
            gd_pan = gd.at[PAN].set(
                jnp.where(new_lvl <= old_lvl - 2, 65, gd[PAN]))
            gd_ath = gd.at[ATHENA].set(
                64 + jnp.where(new_lvl > old_lvl, 1, 0))
            idx = jnp.arange(25)
            gd_rst = jnp.where(idx < nb_gods, jnp.minimum(64, gd), gd)
            gd = jnp.where(has_pan, gd_pan,
                           jnp.where(has_ath, gd_ath, gd_rst))
            return wk, lv, gd, False

        def g_apollo(wk, lv, gd):
            a, c = wk[old[0], old[1]], wk[new[0], new[1]]
            wk = wk.at[old[0], old[1]].set(c).at[new[0], new[1]].set(a)
            lv = lv.at[bp[0], bp[1]].add(1)
            return wk, lv, gd, False

        def g_minotaur(wk, lv, gd):
            pp = jnp.clip(new + dirs[m], 0, 4)
            opp_id = wk[new[0], new[1]]
            wk = wk.at[pp[0], pp[1]].set(opp_id) \
                .at[new[0], new[1]].set(wid).at[old[0], old[1]].set(0)
            lv = lv.at[bp[0], bp[1]].add(1)
            return wk, lv, gd, False

        def g_atlas(wk, lv, gd):
            wk = wk.at[old[0], old[1]].set(0).at[new[0], new[1]].set(wid)
            lv = lv.at[bp[0], bp[1]].set(4)
            return wk, lv, gd, False

        def g_hephaestus(wk, lv, gd):
            wk = wk.at[old[0], old[1]].set(0).at[new[0], new[1]].set(wid)
            lv = lv.at[bp[0], bp[1]].add(2)
            return wk, lv, gd, False

        def g_artemis(wk, lv, gd):
            wk = wk.at[old[0], old[1]].set(0).at[new[0], new[1]].set(wid)
            gd = gd.at[ARTEMIS].set(64 + (w * 9 + (8 - m) + 1))
            return wk, lv, gd, True

        def g_demeter(wk, lv, gd):
            wk = wk.at[old[0], old[1]].set(0).at[new[0], new[1]].set(wid)
            lv = lv.at[bp[0], bp[1]].add(1)
            gd = gd.at[DEMETER].set(64 + (w * 9 + b + 1))
            return wk, lv, gd, True

        def g_hermes(wk, lv, gd):
            wk = wk.at[old[0], old[1]].set(0).at[new[0], new[1]].set(wid)
            gd = gd.at[HERMES].add(1)
            return wk, lv, gd, True

        def g_prometheus(wk, lv, gd):
            lv = lv.at[bp_old[0], bp_old[1]].add(1)
            gd = gd.at[PROMETHEUS].set(64 + (w * 9 + 1))
            return wk, lv, gd, True

        wk, lv, gd, again = jax.lax.switch(
            g, [g_nogod, g_apollo, g_minotaur, g_atlas, g_hephaestus,
                g_artemis, g_demeter, g_hermes, g_nogod, g_nogod,
                g_prometheus],
            workers, levels, gods)
        gd = gd.at[round_cell].add(jnp.where(gd[round_cell] < 127, 1, 0))
        nxt = jnp.stack([wk.astype(jnp.int8), lv.astype(jnp.int8),
                         gd.reshape(5, 5).astype(jnp.int8)], axis=-1)
        return nxt, jnp.where(again, 0, 1).astype(jnp.int32)

    valids_fn = _valids_gods if nb_gods > 1 else valids
    step_fn = _step_gods if nb_gods > 1 else step

    # --- swap_players (reference lines 567-576) -----------------------------

    def canonical(state, swap):
        workers = state[:, :, 0]
        gods = state[:, :, 2].reshape(25)
        idx = jnp.arange(25)
        rolled = gods[jnp.where(idx < 2 * nb_gods,
                                (idx + nb_gods) % (2 * nb_gods), idx)]
        swapped = jnp.stack(
            [(-workers).astype(jnp.int8), state[:, :, 1],
             rolled.reshape(5, 5).astype(jnp.int8)], axis=-1)
        return jnp.where((swap % num_players) == 1, swapped, state)

    # --- check_end_game (reference lines 552-565) ---------------------------

    def get_score(state, player):
        workers, levels, _ = _planes(state)
        mine = jnp.where(player == 0, workers > 0, workers < 0)
        return jnp.max(jnp.where(mine, levels, 0)).astype(jnp.float32)

    def terminal(state):
        _, _, gods = _planes(state)
        s0, s1 = get_score(state, 0), get_score(state, 1)
        p0_pan = gods[PAN + nb_gods * 0] > 64 if nb_gods > PAN else False
        p1_pan = gods[PAN + nb_gods * 1] > 64 if nb_gods > PAN else False
        p0_win = (s0 == 3) | p0_pan
        p1_win = (s1 == 3) | p1_pan
        blocked = ~jnp.any(valids_fn(state))
        win0 = jnp.array([1.0, -1.0], jnp.float32)
        win1 = jnp.array([-1.0, 1.0], jnp.float32)
        none = jnp.zeros(2, jnp.float32)
        # priority: p0 win, then p1 win, then current player blocked => p1 win
        return jnp.where(p0_win, win0,
                         jnp.where(p1_win | blocked, win1, none))

    # --- init (reference Board.init_game, lines 99-120) ---------------------

    def init(key):
        workers = jnp.zeros((5, 5), jnp.int8)
        gods = jnp.zeros(25, jnp.int8)
        if init_method == 0:
            workers = workers.at[2, 1].set(1).at[2, 3].set(2)
            workers = workers.at[1, 2].set(-1).at[3, 2].set(-2)
        else:
            k_cells, k_gods = jax.random.split(key)
            cells = jax.random.choice(k_cells, 25, (4,), replace=False)
            # reference places in order [1, -1, 2, -2] (line 110)
            vals = jnp.array([1, -1, 2, -2], jnp.int8)
            workers = workers.reshape(25).at[cells].set(vals).reshape(5, 5)
        if nb_gods > 1 and init_method == 1:
            # random distinct gods 1..NB_GODS-1 (reference line 113)
            gs = jax.random.choice(k_gods, nb_gods - 1, (2,),
                                   replace=False) + 1
            gods = gods.at[gs[0]].set(64)
            gods = gods.at[gs[1] + nb_gods].set(64)
        else:
            gods = gods.at[NO_GOD + nb_gods * 0].set(64)
            gods = gods.at[NO_GOD + nb_gods * 1].set(64)
        return jnp.stack([workers, jnp.zeros((5, 5), jnp.int8),
                          gods.reshape(5, 5)], axis=-1)

    # --- misc ---------------------------------------------------------------

    def observe(state):
        return state.astype(jnp.float32)

    def get_round(state):
        return state[:, :, 2].reshape(25)[round_cell].astype(jnp.int32)

    # --- symmetries (reference Board.get_symmetries, lines 578-653) ---------

    # god-flag data transforms under symmetries: ARTEMIS/DEMETER store a
    # (worker*9 + direction) payload that must rotate/flip with the board,
    # and worker swaps shift the payload by 9 (reference
    # _apply_permutation_gods :588-596 + _swap_workers_gods :631-637,
    # including its quirk of also touching ATHENA's 0/1 payload).
    def _dir_lut(core):
        lut = np.arange(128, dtype=np.int8)
        for d in range(18):
            lut[65 + d] = 65 + 9 * (d // 9) + core[d % 9]
        return lut

    _swap_lut_np = np.arange(128, dtype=np.int8)
    for _d in range(18):
        _swap_lut_np[65 + _d] = 65 + (_d + 9) % 18
    _rot_lut1 = _dir_lut(_ROT_CORE)
    _rot_lut2 = _rot_lut1[_rot_lut1]
    _rot_lut3 = _rot_lut2[_rot_lut1]
    god_dir_luts = jnp.asarray(np.stack([
        np.arange(128, dtype=np.int8), _rot_lut1, _rot_lut2, _rot_lut3,
        _dir_lut(_FLIPLR_CORE), _dir_lut(_FLIPUD_CORE)]))
    swap_lut = jnp.asarray(_swap_lut_np)

    def _god_variant(godp, variant: int):
        """Transformed god plane for symmetry `variant` (0..7)."""
        if nb_gods == 1:
            return godp
        flat = godp.reshape(25).astype(jnp.int32)
        if variant < 6:                      # identity/rot/flips: direction
            lut = god_dir_luts[variant]
            cells = [ARTEMIS, DEMETER, ARTEMIS + nb_gods, DEMETER + nb_gods]
        else:                                # worker swaps: payload += 9
            lut = swap_lut
            off = 0 if variant == 6 else nb_gods
            # PROMETHEUS payload also encodes the worker; the reference
            # forgets to remap it (_swap_workers_gods :631-637), which makes
            # its worker-swap symmetry constrain the wrong worker — fixed
            # here (HERMES stays: its payload is a move count, not a worker)
            cells = [ARTEMIS + off, DEMETER + off, ATHENA + off,
                     PROMETHEUS + off]
        for c in cells:
            flat = flat.at[c].set(lut[flat[c]])
        return flat.reshape(5, 5).astype(jnp.int8)

    def symmetries(state, pi, valid):
        workers = state[:, :, 0]
        levels = state[:, :, 1]
        godp = state[:, :, 2]

        def pack(w, l, variant):
            return jnp.stack([w, l, _god_variant(godp, variant)], axis=-1)

        states = [state]
        w, l = workers, levels
        for k in range(3):
            w, l = jnp.rot90(w), jnp.rot90(l)
            states.append(pack(w, l, k + 1))
        states.append(pack(jnp.fliplr(workers), jnp.fliplr(levels), 4))
        states.append(pack(jnp.flipud(workers), jnp.flipud(levels), 5))

        # swap own workers 1<->2 (state values swapped, policy halves swapped)
        sw = jnp.where(workers == 1, 2,
                       jnp.where(workers == 2, 1, workers)).astype(jnp.int8)
        states.append(pack(sw, levels, 6))
        # swap opponent workers -1<->-2 (policy unchanged)
        so = jnp.where(workers == -1, -2,
                       jnp.where(workers == -2, -1, workers)).astype(jnp.int8)
        states.append(pack(so, levels, 7))

        st = jnp.stack(states)                      # (8, 5, 5, 3)
        pis = pi[action_gathers]                    # (8, A)
        vas = valid[action_gathers]
        return st, pis, vas

    return GameSpec(
        name=f"santorini{'_nogods' if nb_gods == 1 else ''}"
             f"{'_detinit' if init_method == 0 else ''}",
        num_players=num_players,
        state_shape=(5, 5, 3),
        obs_shape=(5, 5, 3),
        num_actions=num_actions,
        max_game_length=128 if nb_gods == 1 else 200,
        init=init,
        valids=valids_fn,
        step=step_fn,
        canonical=canonical,
        terminal=terminal,
        observe=observe,
        get_round=get_round,
        get_score=get_score,
        symmetries=symmetries,
        num_symmetries=num_symmetries,
        meta=SantoriniMeta(nb_gods=nb_gods, init_method=init_method),
    )
