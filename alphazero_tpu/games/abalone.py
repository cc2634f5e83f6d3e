"""Abalone — TPU-native vectorized engine (deterministic, hex board).

Behavioral reference: /root/reference/abalone/AbaloneLogicNumba.py (440 LoC).
The reference walks the 61 axial cells with nested loops per move family;
here the entire geometry (group cells, broadside targets, inline push chains)
is precomputed per action into static index tables, so valid-move computation
for all 3402 actions is a handful of gathers + boolean algebra, and a move is
a few masked scatters.

State (9,9,4) int8 (reference lines 8-22): ch0 current player's marbles,
ch1 opponent's, ch2 playable-cell mask (4 <= r+q <= 12), ch3 misc
((0,0)/(0,1) scores, (0,2) round, (0,3) dynamic-komi tie owner).

Actions (3402 = 9*9*42): anchor cell x plane, plane = direction (size 1),
6 + axis*6 + direction (size 2), 24 + axis*6 + direction (size 3)
(reference lines 24-84).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from alphazero_tpu.games.base import GameSpec

NUM_ACTIONS = 3402
# axial directions (reference lines 53-60)
_DIRS = np.array([[0, 1], [1, 0], [1, -1], [0, -1], [-1, 0], [-1, 1]],
                 np.int64)
_FLIP_D = np.array([3, 2, 1, 0, 5, 4], np.int64)  # direction map under flip


def _playable(r, q):
    return (0 <= r < 9) and (0 <= q < 9) and (4 <= r + q <= 12)


def _decode(a):
    plane = a % 42
    q = (a // 42) % 9
    r = a // (42 * 9)
    d = plane % 6
    if plane < 6:
        size, axis = 1, 0
    elif plane < 24:
        size, axis = 2, (plane - 6) // 6
    else:
        size, axis = 3, (plane - 24) // 6
    return r, q, size, axis, d


def _encode(r, q, size, axis, d):
    if size == 1:
        plane = d
    elif size == 2:
        plane = 6 + axis * 6 + d
    else:
        plane = 24 + axis * 6 + d
    return r * 9 * 42 + q * 42 + plane


def _flat(r, q):
    """Flat cell index; 81 = out-of-board sentinel (dropped by scatters)."""
    return r * 9 + q if _playable(r, q) else 81


def _build_tables():
    A = NUM_ACTIONS
    group = np.full((A, 3), 81, np.int32)        # marbles of the group
    group_n = np.zeros(A, np.int32)              # group size
    group_on = np.zeros(A, bool)                 # all group cells playable
    inline = np.zeros(A, bool)
    btarg = np.full((A, 3), 81, np.int32)        # broadside targets
    btarg_on = np.zeros(A, bool)
    chain = np.full((A, 3), 81, np.int32)        # inline cells c1..c3
    chain_on = np.zeros((A, 3), bool)
    back = np.full(A, 81, np.int32)              # inline trailing cell
    front_t = np.full(A, 81, np.int32)           # inline first target (c1)

    for a in range(A):
        r, q, size, axis, d = _decode(a)
        cells = [(r + i * _DIRS[axis, 0], q + i * _DIRS[axis, 1])
                 for i in range(size)]
        group_n[a] = size
        group_on[a] = all(_playable(*c) for c in cells)
        for i, c in enumerate(cells):
            group[a, i] = _flat(*c)
        inline[a] = size > 1 and (d == axis or d == (axis + 3) % 6)

        if not inline[a]:
            ts = [(cr + _DIRS[d, 0], cq + _DIRS[d, 1]) for cr, cq in cells]
            btarg_on[a] = all(_playable(*t) for t in ts)
            for i, t in enumerate(ts):
                btarg[a, i] = _flat(*t)
        else:
            if d == axis:
                fr, fq = cells[-1]
                br, bq = cells[0]
            else:
                fr, fq = cells[0]
                br, bq = cells[-1]
            back[a] = _flat(br, bq)
            for j in range(3):
                cr = fr + (j + 1) * _DIRS[d, 0]
                cq = fq + (j + 1) * _DIRS[d, 1]
                chain[a, j] = _flat(cr, cq)
                chain_on[a, j] = _playable(cr, cq)
            front_t[a] = chain[a, 0]

    return dict(group=group, group_n=group_n, group_on=group_on,
                inline=inline, btarg=btarg, btarg_on=btarg_on, chain=chain,
                chain_on=chain_on, back=back, front_t=front_t)


_T = _build_tables()


def _transform_cell(r, q, rot, flip):
    if flip:
        r, q = r, 12 - r - q
    for _ in range(rot):
        r, q = q + r - 4, 8 - r
    return r, q


def _build_symmetry_tables():
    """12 board-cell gather maps (82-padded flat) + action gather maps.

    Reference applies scatter maps (new[map[a]] = old[a], AbaloneLogicNumba.py
    :408-441); we store the inverse for gathers."""
    cell_g = np.full((12, 81), 81, np.int32)
    act_g = np.zeros((12, NUM_ACTIONS), np.int32)
    k = 0
    for rot in range(6):
        for flip in range(2):
            # cells: new[nr,nq] = old[r,q]
            for r in range(9):
                for q in range(9):
                    if _playable(r, q):
                        nr, nq = _transform_cell(r, q, rot, flip)
                        cell_g[k, nr * 9 + nq] = r * 9 + q
            # actions (reference _build_action_symmetries, :95-148).
            # Rigid motions biject the set of fully-on-board groups onto
            # itself; actions with off-board group cells are never valid and
            # transform out of range, so restrict inversion to on-board
            # groups and leave the rest as identity.
            inv = np.arange(NUM_ACTIONS, dtype=np.int64)
            for a in range(NUM_ACTIONS):
                r, q, size, axis, d = _decode(a)
                src = [(r + i * _DIRS[axis, 0], q + i * _DIRS[axis, 1])
                       for i in range(size)]
                if not all(_playable(*c) for c in src):
                    continue
                pts = [_transform_cell(*c, rot, flip) for c in src]
                mi = min(range(size), key=lambda i: (pts[i][0], pts[i][1]))
                nr, nq = pts[mi]
                new_axis = 0
                if size > 1:
                    oi = 1 if mi == 0 else 0
                    dr, dq = pts[oi][0] - nr, pts[oi][1] - nq
                    if dr == 0 and dq > 0:
                        new_axis = 0
                    elif dr > 0 and dq == 0:
                        new_axis = 1
                    elif dr > 0 and dq < 0:
                        new_axis = 2
                nd = _FLIP_D[d] if flip else d
                nd = (nd + rot) % 6
                inv[_encode(nr, nq, size, new_axis, nd)] = a
            act_g[k] = inv
            k += 1
    return cell_g, act_g


@dataclasses.dataclass(frozen=True)
class AbaloneMeta:
    initial_layout: int
    dynamic_komi: bool


def make_abalone(num_players: int = 2, initial_layout: int = 1,
                 dynamic_komi: bool = False) -> GameSpec:
    """initial_layout: 0 Classic, 1 Belgian Daisy, 2 German Daisy
    (reference INITIAL_LAYOUT, AbaloneLogicNumba.py:5)."""
    if num_players != 2:
        raise ValueError("Abalone is a 2-player game")
    if initial_layout not in (0, 1, 2):
        raise ValueError("initial_layout must be 0, 1 or 2")

    T = {k: jnp.asarray(v) for k, v in _T.items()}
    cell_g_np, act_g_np = _build_symmetry_tables()
    cell_g = jnp.asarray(cell_g_np)
    act_g = jnp.asarray(act_g_np)

    def _i32(s):
        return s.astype(jnp.int32)

    def _occ(plane_flat, idx):
        """Gather with 81 = off-board sentinel -> 0."""
        padded = jnp.concatenate([plane_flat, jnp.zeros(1, plane_flat.dtype)])
        return padded[idx]

    # ---------------- valid moves (reference valid_moves, :254-331) --------

    def valids(state):
        s = _i32(state)
        mine = s[:, :, 0].reshape(81)
        opp = s[:, :, 1].reshape(81)

        g_mine = _occ(mine, T["group"])                   # (A,3)
        n = T["group_n"][:, None]
        in_group = jnp.arange(3)[None, :] < n
        own_ok = T["group_on"] & jnp.all(g_mine.astype(bool) | ~in_group,
                                         axis=1)

        # broadside / size-1: all targets on board and empty
        t_mine = _occ(mine, T["btarg"])
        t_opp = _occ(opp, T["btarg"])
        empt = (~t_mine.astype(bool)) & (~t_opp.astype(bool))
        broad_ok = T["btarg_on"] & jnp.all(empt | ~in_group, axis=1)

        # inline: push-chain logic on c1..c3
        c_mine = _occ(mine, T["chain"]).astype(bool)      # (A,3)
        c_opp = _occ(opp, T["chain"]).astype(bool)
        c_on = T["chain_on"]
        c_empty = c_on & ~c_mine & ~c_opp
        c1_on, c2_on, c3_on = c_on[:, 0], c_on[:, 1], c_on[:, 2]
        c1_mine = c_mine[:, 0]
        c1_opp, c2_opp, c3_opp = c_opp[:, 0], c_opp[:, 1], c_opp[:, 2]
        c1_e, c2_e, c3_e = c_empty[:, 0], c_empty[:, 1], c_empty[:, 2]

        size2 = T["group_n"] == 2
        push_ok = jnp.where(
            size2,
            ~c2_on | c2_e,                                # one opp pushed
            (~c2_on | c2_e) | (c2_opp & (~c3_on | c3_e)))  # up to two
        inline_ok = c1_on & ~c1_mine & (c1_e | (c1_opp & push_ok))

        move_ok = jnp.where(T["inline"], inline_ok, broad_ok)
        return own_ok & move_ok

    # ---------------- make_move (reference :333-374) -----------------------

    def step(state, action, key, seed):
        del key, seed  # deterministic game
        action = jnp.asarray(action, jnp.int32)
        s = _i32(state)
        mine = s[:, :, 0].reshape(81)
        opp = s[:, :, 1].reshape(81)
        misc = state[:, :, 3]

        is_inline = T["inline"][action]
        group = T["group"][action]                        # (3,)
        n = T["group_n"][action]
        in_group = jnp.arange(3) < n
        btarg = T["btarg"][action]

        # broadside / size-1: clear group, set targets (disjoint by rules)
        src_b = jnp.where(in_group & ~is_inline, group, 82)
        dst_b = jnp.where(in_group & ~is_inline, btarg, 82)

        # inline: push chain
        chain = T["chain"][action]                        # (3,)
        c_on = T["chain_on"][action]
        c_opp = _occ(opp, chain).astype(bool) & c_on
        k = jnp.where(c_opp[0],
                      jnp.where(c_opp[1], 2, 1), 0)       # opp marbles pushed
        c1 = chain[0]
        back = T["back"][action]
        dest = chain[jnp.minimum(k, 2)]                   # cell after chain
        dest_on = jnp.where(k == 0, True,
                            jnp.where(k == 1, c_on[1], c_on[2]))
        pushing = is_inline & (k > 0)
        eject = pushing & ~dest_on

        padded_set = lambda plane, idx, val: jnp.concatenate(
            [plane, jnp.zeros(2, plane.dtype)]).at[idx].set(val)[:81]

        # opponent plane updates
        opp = padded_set(opp, jnp.where(pushing, c1, 82), 0)
        opp = padded_set(opp, jnp.where(pushing & ~eject, dest, 82), 1)
        # player plane updates (broadside clears/sets masked to 82)
        mine_p = jnp.concatenate([mine, jnp.zeros(2, mine.dtype)])
        mine_p = mine_p.at[src_b].set(0, mode="drop")
        mine_p = mine_p.at[dst_b].set(1, mode="drop")
        mine_p = mine_p.at[jnp.where(is_inline, back, 82)].set(0)
        mine_p = mine_p.at[jnp.where(is_inline, c1, 82)].set(1)
        mine = mine_p[:81]

        misc = misc.at[0, 0].add(jnp.where(eject, 1, 0).astype(jnp.int8))
        misc = misc.at[0, 2].add(1)

        nxt = jnp.stack([mine.reshape(9, 9).astype(jnp.int8),
                         opp.reshape(9, 9).astype(jnp.int8),
                         state[:, :, 2], misc], axis=-1)
        return nxt, jnp.int32(1)

    # ---------------- swap / terminal / misc -------------------------------

    def canonical(state, swap):
        k = swap % 2
        misc = state[:, :, 3]
        m2 = misc.at[0, 0].set(misc[0, 1]).at[0, 1].set(misc[0, 0])
        if dynamic_komi:
            m2 = m2.at[0, 3].set(1 - misc[0, 3])
        sw = jnp.stack([state[:, :, 1], state[:, :, 0], state[:, :, 2], m2],
                       axis=-1)
        return jnp.where(k == 1, sw, state)

    def terminal(state):
        """(reference check_end_game, :376-392)"""
        misc = _i32(state)[:, :, 3]
        s0, s1, rnd = misc[0, 0], misc[0, 1], misc[0, 2]
        win0 = jnp.array([1.0, -1.0], jnp.float32)
        win1 = jnp.array([-1.0, 1.0], jnp.float32)
        if dynamic_komi:
            tie = jnp.where(misc[0, 3] == 1, win0, win1)
        else:
            tie = jnp.array([0.001, 0.001], jnp.float32)
        cap = jnp.where(s0 > s1, win0, jnp.where(s1 > s0, win1, tie))
        return jnp.where(s0 >= 6, win0,
                         jnp.where(s1 >= 6, win1,
                                   jnp.where(rnd >= 127, cap,
                                             jnp.zeros(2, jnp.float32))))

    def get_score(state, player):
        misc = _i32(state)[:, :, 3]
        return jnp.where(player == 0, misc[0, 0],
                         misc[0, 1]).astype(jnp.float32)

    def get_round(state):
        return state[:, :, 3][0, 2].astype(jnp.int32)

    def init(key):
        rr, qq = np.meshgrid(np.arange(9), np.arange(9), indexing="ij")
        mask = ((rr + qq >= 4) & (rr + qq <= 12)).astype(np.int8)
        my = np.zeros((9, 9), np.int8)
        op = np.zeros((9, 9), np.int8)
        if initial_layout == 0:      # Classic (reference :179-187)
            op[0, 4:9] = 1; op[1, 3:9] = 1; op[2, 4:7] = 1
            my[8, 0:5] = 1; my[7, 0:6] = 1; my[6, 2:5] = 1
        elif initial_layout == 1:    # Belgian Daisy (reference :189-207)
            op[0, 4:6] = 1; op[1, 3:6] = 1; op[2, 3:5] = 1
            op[6, 4:6] = 1; op[7, 3:6] = 1; op[8, 3:5] = 1
            my[0, 7:9] = 1; my[1, 6:9] = 1; my[2, 6:8] = 1
            my[6, 1:3] = 1; my[7, 0:3] = 1; my[8, 0:2] = 1
        else:                        # German Daisy (reference :209-227)
            op[1, 4:6] = 1; op[2, 3:6] = 1; op[3, 3:5] = 1
            op[5, 4:6] = 1; op[6, 3:6] = 1; op[7, 3:5] = 1
            my[1, 6:8] = 1; my[2, 5:8] = 1; my[3, 5:7] = 1
            my[5, 2:4] = 1; my[6, 1:4] = 1; my[7, 1:3] = 1
        st = jnp.asarray(np.stack([my, op, mask, np.zeros((9, 9), np.int8)],
                                  axis=-1))
        if dynamic_komi:
            komi = jax.random.randint(key, (), 0, 2).astype(jnp.int8)
            st = st.at[0, 3, 3].set(komi)
        return st

    def observe(state):
        return state.astype(jnp.float32)

    def symmetries(state, pi, valid):
        planes = state[:, :, :3].reshape(81, 3)
        padded = jnp.concatenate([planes, jnp.zeros((1, 3), state.dtype)])
        st = padded[cell_g].reshape(12, 9, 9, 3)          # (12,9,9,3)
        misc = jnp.broadcast_to(state[:, :, 3], (12, 9, 9))
        states = jnp.concatenate([st, misc[..., None]], axis=-1)
        return states, pi[act_g], valid[act_g]

    return GameSpec(
        name=f"abalone_l{initial_layout}",
        num_players=2,
        state_shape=(9, 9, 4),
        obs_shape=(9, 9, 4),
        num_actions=NUM_ACTIONS,
        max_game_length=130,
        init=init,
        valids=valids,
        step=step,
        canonical=canonical,
        terminal=terminal,
        observe=observe,
        get_round=get_round,
        get_score=get_score,
        symmetries=symmetries,
        num_symmetries=12,
        meta=AbaloneMeta(initial_layout=initial_layout,
                         dynamic_komi=dynamic_komi),
    )
