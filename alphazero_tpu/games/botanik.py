"""Botanik — TPU-native vectorized engine.

Behavioral reference: /root/reference/botanik/BotanikLogicNumba.py (787 LoC)
+ BotanikConstants.py (MACHINE_SIZE=7).  Two-player card-drafting game with a
sub-turn state machine: the "main" player places an arrival card onto their
register or the middle row; middle-row placements can unlink register cards,
which must then be swapped (mecabots) or built into each player's 7x7 pipe
machine before the next draft.

From-scratch functional JAX implementation.  The reference's recursive DFS
machine scoring (connected same-color areas reachable from the source card,
BotanikLogicNumba.py:714-786) becomes a two-stage fixpoint label propagation;
placement validity (pipe continuity vs the incremental optim planes,
:687-712) is one broadcasted tensor expression over 2 cards x 49 cells x 4
orientations.

State: (66, 5, 7) int8, reference layout (BotanikLogicNumba.py:7-61):
  row 0      misc: [0]=round/status/main/open-pipes, [1]=scores,
             [3:5]=13-bit per-color deck bitfield (2 int8 bytes per color)
  row 1      arrival cards (3 of 5 slots used)
  rows 2,3   player registers; row 4 middle row; row 5 freed cards (2/player)
  rows 6-25  the two 7x7x7 machines flattened into 10 (5,7) rows each
  rows 26-45 optim_neighbors planes; rows 46-65 optim_needpipes planes

Actions (428 = 36 + 8*49, reference :63-99): 15 arrival->register,
15 arrival->middle, 5 mecabot swaps, 392 machine expansions
(2 freed cards x 49 cells x 4 orientations), 1 throw-away.

Chance: deck draws are true-random in the reference (np.random.random via
inverse-CDF, :112-115, :414-438 — the universes seed is ignored).  Here
seed == 0 uses the PRNG key; seed != 0 encodes the three draw ranks in
base 66 (rank_i = ((seed-1) // 66^i) % 66, taken mod the live count), which
doubles as the deterministic-universe path and as the parity-test injection
channel.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from alphazero_tpu.games.base import GameSpec

M = 7                       # MACHINE_SIZE
MM = M * M
NB_ROWS = (MM * 7 + 34) // 35          # ceil(49*7 / 35) rows of (5,7)
NUM_ACTIONS = 36 + 8 * MM              # 428
A_THROW = NUM_ACTIONS - 1
SRC_Y, SRC_X = M // 3, M // 2          # source card at (2, 3)

# colors / types (BotanikConstants.py:9-25)
EMPTY, SOURCE = 0, 1
PIPE2_ANGLE, PIPE2_STRAIGHT, PIPE3, PIPE4, PLANT, VEGET, MECABOT = range(7)
# status values (BotanikConstants.py:27-32)
ST_PUT, ST_OTHER_EXPAND, ST_OTHER_SWAP, ST_MAIN_EXPAND, ST_MAIN_SWAP = range(5)
NORTH, EAST, SOUTH, WEST = 3, 4, 5, 6

# 13 generic cards x 5 colors (BotanikConstants.py:58-79)
_GENERIC = np.array([
    #  col #flo type N  E  S  W
    [-1, 0, 0, 0, 1, 1, 0],
    [-1, 0, 0, 0, 1, 1, 0],
    [-1, 1, 0, 0, 1, 1, 0],
    [-1, 0, 1, 1, 0, 1, 0],
    [-1, 0, 1, 1, 0, 1, 0],
    [-1, 1, 1, 1, 0, 1, 0],
    [-1, 0, 2, 0, 1, 1, 1],
    [-1, 0, 2, 0, 1, 1, 1],
    [-1, 1, 2, 0, 1, 1, 1],
    [-1, 0, 3, 1, 1, 1, 1],
    [-1, 3, 4, 0, 0, 1, 0],
    [-1, 3, 5, 0, 0, 1, 0],
    [-1, 0, 6, 0, 0, 0, 0],
], np.int8)
ALL_CARDS = np.tile(_GENERIC, (5, 1, 1))
for _c in range(5):
    ALL_CARDS[_c, :, 0] = _c + 2
SOURCE_CARD = np.array([SOURCE, 0, 0, 0, 0, 1, 0], np.int8)

_BIT_W13 = np.array([4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1],
                    np.int32)
# direction deltas in NORTH,EAST,SOUTH,WEST order
_DY = np.array([-1, 0, 1, 0], np.int32)
_DX = np.array([0, 1, 0, -1], np.int32)

# symmetry permutations (BotanikConstants.py:42-56)
PERMS_ARRIVAL = np.array([[0, 2, 1], [1, 0, 2], [2, 1, 0]], np.int32)
PERMS_REGISTER = np.array([
    [0, 3, 2, 4, 1], [1, 0, 3, 2, 4], [2, 4, 1, 0, 3],
    [3, 2, 4, 1, 0], [4, 1, 0, 3, 2]], np.int32)

# state row offsets
R_MISC, R_ARR, R_REG0, R_REG1, R_MID, R_FREED = 0, 1, 2, 3, 4, 5
R_M0 = 6
R_M1 = R_M0 + NB_ROWS
R_NB0 = R_M0 + 2 * NB_ROWS
R_NB1 = R_M0 + 3 * NB_ROWS
R_NP0 = R_M0 + 4 * NB_ROWS
R_NP1 = R_M0 + 5 * NB_ROWS
N_ROWS = 6 + 6 * NB_ROWS


@dataclasses.dataclass(frozen=True)
class BotanikMeta:
    num_players: int


def make_botanik() -> GameSpec:
    dy, dx = jnp.asarray(_DY), jnp.asarray(_DX)
    bit_w = jnp.asarray(_BIT_W13)
    all_cards = jnp.asarray(ALL_CARDS, jnp.int32)
    source_card = jnp.asarray(SOURCE_CARD, jnp.int32)
    # static in-bounds pipe mask per cell: [y>0, x<M-1, y<M-1, x>0]
    yy, xx = np.mgrid[0:M, 0:M]
    inb_np = np.stack([yy > 0, xx < M - 1, yy < M - 1, xx > 0], -1)
    inb = jnp.asarray(inb_np)

    def _i32(s):
        return s.astype(jnp.int32)

    # -------- machine block pack/unpack (reference copy_state views) -------

    def get_block(s, row0):
        flat = s[row0:row0 + NB_ROWS].reshape(NB_ROWS * 35)
        return flat[:MM * 7].reshape(M, M, 7)

    def set_block(state, row0, m):
        tail = state[row0:row0 + NB_ROWS].reshape(NB_ROWS * 35)[MM * 7:]
        flat = jnp.concatenate([m.reshape(MM * 7).astype(jnp.int8), tail])
        return state.at[row0:row0 + NB_ROWS].set(flat.reshape(NB_ROWS, 5, 7))

    # -------- deck bitfield (reference :101-125, :414-438) ------------------

    def get_avail(s):
        """(5, 13) bool from the 2-byte-per-color bitfield at misc[3:5]."""
        hi = jnp.where(s[R_MISC, 3, :5] < 0, s[R_MISC, 3, :5] + 256,
                       s[R_MISC, 3, :5])
        lo = jnp.where(s[R_MISC, 4, :5] < 0, s[R_MISC, 4, :5] + 256,
                       s[R_MISC, 4, :5])
        vals = hi * 256 + lo                              # (5,)
        return (vals[:, None] & bit_w) != 0

    def set_avail(state, avail):
        vals = jnp.sum(avail.astype(jnp.int32) * bit_w, axis=1)   # (5,)
        hi, lo = vals // 256, vals % 256
        hi = jnp.where(hi > 127, hi - 256, hi)
        lo = jnp.where(lo > 127, lo - 256, lo)
        state = state.at[R_MISC, 3, :5].set(hi.astype(jnp.int8))
        state = state.at[R_MISC, 4, :5].set(lo.astype(jnp.int8))
        return state

    def draw_cards(state, key, seed, n_draws: int, dst_row: int):
        """Draw n_draws cards into rows dst_row[0..n) slot-wise; flat order
        color*13+card, rank chosen by seed/key (see module docstring)."""
        s = _i32(state)
        avail = get_avail(s).reshape(65)
        total0 = jnp.sum(avail)

        def one(i, carry):
            state, avail = carry
            count = jnp.maximum(jnp.sum(avail), 1)
            k_rank = jax.random.randint(jax.random.fold_in(key, i), (),
                                        0, count)
            d_rank = ((seed - 1) // (66 ** i)) % 66 % count
            rank = jnp.where(seed == 0, k_rank, d_rank)
            csum = jnp.cumsum(avail)
            flat = jnp.argmax(avail & (csum == rank + 1))
            card = all_cards[flat // 13, flat % 13]
            state = state.at[dst_row, i].set(card.astype(jnp.int8))
            return state, avail.at[flat].set(False)

        new_state, new_avail = state, avail
        for i in range(n_draws):
            new_state, new_avail = one(i, (new_state, new_avail))
        new_state = set_avail(new_state, new_avail.reshape(5, 13))
        # reference returns None (arrival untouched) when the deck is empty
        return jax.lax.cond(total0 == 0, lambda a, b: a, lambda a, b: b,
                            state, new_state)

    # -------- machine analyses ----------------------------------------------

    def neighbor_gather(x, fill):
        """x: (M,M) -> (M,M,4) values of N/E/S/W neighbors, fill off-board."""
        ny = yy[:, :, None] + _DY[None, None, :]
        nx = xx[:, :, None] + _DX[None, None, :]
        ok = (ny >= 0) & (ny < M) & (nx >= 0) & (nx < M)
        v = x[jnp.clip(ny, 0, M - 1), jnp.clip(nx, 0, M - 1)]
        return jnp.where(ok, v, fill)

    def open_pipes(machine):
        """reference _compute_open_pipes (:671-685)."""
        nonempty = machine[:, :, 0] != EMPTY
        nb_empty = neighbor_gather(nonempty, True) == False  # noqa: E712
        pipes = machine[:, :, 3:7] > 0
        return jnp.sum(nonempty[:, :, None] & inb & nb_empty & pipes)

    def compute_score(machine):
        """reference _compute_score (:714-786): connected same-color areas
        among cells pipe-reachable from the source; area scores
        cards+flowers if cards >= 3 else flowers; source area excluded."""
        nonempty = machine[:, :, 0] != EMPTY
        pipes = machine[:, :, 3:7] > 0
        nb_nonempty = neighbor_gather(nonempty, False)
        edge = pipes & inb & nb_nonempty                    # (M,M,4)

        reach0 = jnp.zeros((M, M), bool).at[SRC_Y, SRC_X].set(True)

        def spread(r):
            nb_r = neighbor_gather(r, False)
            return r | (nonempty & jnp.any(nb_r & edge, axis=-1))

        reach = _fix(spread, reach0)

        color = machine[:, :, 0]
        scored = reach & nonempty & (color != SOURCE)
        nb_color = neighbor_gather(color, -1)
        same = edge & (nb_color == color[:, :, None])
        idx2d = jnp.arange(MM).reshape(M, M)
        lab0 = jnp.where(scored, idx2d, MM)

        def prop(lab):
            nb_lab = neighbor_gather(lab, MM)
            nb_lab = jnp.where(same, nb_lab, MM)
            return jnp.where(scored,
                             jnp.minimum(lab, jnp.min(nb_lab, axis=-1)), MM)

        lab = _fix(prop, lab0).reshape(MM)
        ones = scored.reshape(MM).astype(jnp.int32)
        flowers = (machine[:, :, 1].reshape(MM)) * ones
        n_cards = jax.ops.segment_sum(ones, lab, num_segments=MM + 1)[:MM]
        n_flow = jax.ops.segment_sum(flowers, lab, num_segments=MM + 1)[:MM]
        return jnp.sum(jnp.where(n_cards >= 3, n_cards + n_flow, n_flow))

    def _fix(body, x0):
        def cond(c):
            return c[1]

        def stp(c):
            x, _ = c
            nx = body(x)
            return nx, jnp.any(nx != x)

        return jax.lax.while_loop(cond, stp, (x0, jnp.bool_(True)))[0]

    def update_optims(machine, nbrs, needp, y, x):
        """reference _update_optims (:615-627): incremental candidate/pipe
        bookkeeping around a newly placed card at (y, x)."""
        placed_pipes = machine[y, x, 3:7] > 0                # (4,)
        for d in range(4):
            ny, nx = y + _DY[d], x + _DX[d]
            ok = (ny >= 0) & (ny < M) & (nx >= 0) & (nx < M)
            cy, cx = jnp.clip(ny, 0, M - 1), jnp.clip(nx, 0, M - 1)
            opp = (d + 2) % 4
            nbrs = nbrs.at[cy, cx, 0].set(
                jnp.where(ok, (machine[cy, cx, 0] == EMPTY).astype(jnp.int32),
                          nbrs[cy, cx, 0]))
            nbrs = nbrs.at[cy, cx, 3 + opp].set(
                jnp.where(ok, 1, nbrs[cy, cx, 3 + opp]))
            needp = needp.at[cy, cx, 3 + opp].set(
                jnp.where(ok, placed_pipes[d].astype(jnp.int32),
                          needp[cy, cx, 3 + opp]))
        nbrs = nbrs.at[y, x, :].set(0)
        needp = needp.at[y, x, :].set(0)
        return nbrs, needp

    # -------- valid moves ----------------------------------------------------

    def valids(state):
        s = _i32(state)
        status = s[R_MISC, 0, 1]
        arrival, middle, reg0 = s[R_ARR], s[R_MID], s[R_REG0]
        freed = s[R_FREED]

        # register placements (reference _valid_register, :445-463)
        arr_ok = arrival[:3, 0] != EMPTY                     # (3,)
        slot_empty = reg0[:, 0] == EMPTY                     # (5,)
        match = (middle[None, :, 0] == arrival[:3, None, 0]) | \
                (middle[None, :, 2] == arrival[:3, None, 2])  # (3,5)
        v_reg = (arr_ok[:, None] & slot_empty[None, :] & match).reshape(15)
        v_mid = jnp.repeat(arr_ok, 5)                        # (15,)

        # mecabot swaps (reference _valid_swap_mecabot, :465-467)
        v_swap = middle[:, 2] != MECABOT                     # (5,)

        # machine expansion (reference _valid_expand_mach, :469-486)
        machine = get_block(s, R_M0)
        nbrs = get_block(s, R_NB0)
        needp = get_block(s, R_NP0)
        n_open = open_pipes(machine)
        admissible = nbrs[:, :, 0] > 0                       # (M,M)

        cards = freed[0:2]                                   # (2,7)
        # orientations allowed per card type (straight: 2, pipe4: 1, else 4)
        o4 = jnp.arange(4)
        max_orient = jnp.where(cards[:, 2] == PIPE2_STRAIGHT, 2,
                               jnp.where(cards[:, 2] == PIPE4, 1, 4))  # (2,)
        ocards = jnp.stack([jnp.roll(cards[:, 3:7], o, axis=1)
                            for o in range(4)], axis=1)      # (2,4,4)
        oc = ocards[:, :, None, None, :]                     # (2,4,1,1,4)
        pipes = oc * inb[None, None]                         # (2,4,M,M,4)
        pwn = oc * (nbrs[:, :, 3:7] > 0)[None, None]
        matching = jnp.all(pwn == needp[None, None, :, :, 3:7], axis=-1)
        closed = jnp.sum(pwn, axis=-1)
        opened = jnp.sum(pipes, axis=-1) - closed
        ok = matching & (n_open - closed + opened > 0)
        ok &= admissible[None, None]
        ok &= (o4 < max_orient[:, None])[:, :, None, None]
        ok &= (cards[:, 0] != EMPTY)[:, None, None, None]
        v_exp = jnp.transpose(ok, (0, 2, 3, 1)).reshape(8 * MM)
        v_throw = ~jnp.any(v_exp)

        out = jnp.zeros(NUM_ACTIONS, bool)
        is_put = status == ST_PUT
        is_swap = (status == ST_MAIN_SWAP) | (status == ST_OTHER_SWAP)
        is_exp = (status == ST_MAIN_EXPAND) | (status == ST_OTHER_EXPAND)
        out = out.at[:15].set(v_reg & is_put)
        out = out.at[15:30].set(v_mid & is_put)
        out = out.at[30:35].set(v_swap & is_swap)
        out = out.at[35:35 + 8 * MM].set(v_exp & is_exp)
        out = out.at[A_THROW].set(v_throw & is_exp)
        return out

    # -------- sub-turn helpers (reference :488-567) --------------------------

    def free_card_if_needed(state, slot):
        """Unlink register cards no longer matching middle[slot]; status
        escalates via max (reference _free_card_if_needed, :505-547)."""
        for p, r_reg in ((0, R_REG0), (1, R_REG1)):
            s = _i32(state)
            middle = s[R_MID, slot]
            reg = s[r_reg, slot]
            cond = (reg[0] != EMPTY) & (reg[0] != middle[0]) & \
                   (reg[2] != middle[2])
            slot0_empty = s[R_FREED, 2 * p, 0] == EMPTY
            new_slot = jnp.where(slot0_empty, 0, 1)
            st = state.at[R_FREED, 2 * p + new_slot].set(reg.astype(jnp.int8))
            st = st.at[r_reg, slot].set(jnp.zeros(7, jnp.int8))
            # mecabot must sit on the player's first freed slot
            is_meca = reg[2] == MECABOT
            do_swap = is_meca & (new_slot != 0)
            f0, f1 = st[R_FREED, 2 * p], st[R_FREED, 2 * p + 1]
            st = st.at[R_FREED, 2 * p].set(jnp.where(do_swap, f1, f0))
            st = st.at[R_FREED, 2 * p + 1].set(jnp.where(do_swap, f0, f1))
            is_main = p == s[R_MISC, 0, 2]
            new_status = jnp.where(
                is_meca,
                jnp.where(is_main, ST_MAIN_SWAP, ST_OTHER_SWAP),
                jnp.where(is_main, ST_MAIN_EXPAND, ST_OTHER_EXPAND))
            st = st.at[R_MISC, 0, 1].set(
                jnp.maximum(st[R_MISC, 0, 1],
                            new_status.astype(jnp.int8)))
            state = jnp.where(cond, st, state)
        return state

    def next_status_after_build(state):
        """Shared by expand/throw (reference :591-604, :632-645)."""
        s = _i32(state)
        main = s[R_MISC, 0, 2]
        fmain = s[R_FREED, 2 * main]
        fother = s[R_FREED, 2 * (1 - main)]
        status = jnp.where(
            fmain[0] != EMPTY, ST_MAIN_EXPAND,
            jnp.where(fother[2] == MECABOT, ST_OTHER_SWAP,
                      jnp.where(fother[0] != EMPTY, ST_OTHER_EXPAND,
                                ST_PUT)))
        return state.at[R_MISC, 0, 1].set(status.astype(jnp.int8))

    # -------- step ------------------------------------------------------------

    def step(state, action, key, seed):
        action = jnp.asarray(action, jnp.int32)
        seed = jnp.asarray(seed, jnp.int32)

        def b_register(st):
            card_i, slot = action // 5, action % 5
            card = st[R_ARR, card_i]
            st = st.at[R_REG0, slot].set(card)
            return st.at[R_ARR, card_i].set(jnp.zeros(7, jnp.int8))

        def b_middle(st):
            a = action - 15
            card_i, slot = a // 5, a % 5
            card = st[R_ARR, card_i]
            st = st.at[R_MID, slot].set(card)
            st = st.at[R_ARR, card_i].set(jnp.zeros(7, jnp.int8))
            return free_card_if_needed(st, slot)

        def b_swap_mecabot(st):
            slot = action - 30
            meca = st[R_FREED, 0]            # mecabot is always freed slot 0
            st = st.at[R_FREED, 0].set(st[R_MID, slot])
            st = st.at[R_MID, slot].set(meca)
            st = st.at[R_MISC, 0, 1].add(np.int8(-1))   # SWAP -> EXPAND
            return free_card_if_needed(st, slot)

        def b_expand(st):
            a = action - 35
            card_i, rest = a // (4 * MM), a % (4 * MM)
            cell, orient = rest // 4, rest % 4
            y, x = cell // M, cell % M
            s = _i32(st)
            card = s[R_FREED, card_i]
            oriented = card.at[3:7].set(jnp.roll(card[3:7], orient))
            machine = get_block(s, R_M0).at[y, x].set(oriented)
            st = st.at[R_FREED, card_i].set(jnp.zeros(7, jnp.int8))
            nbrs, needp = update_optims(machine, get_block(s, R_NB0),
                                        get_block(s, R_NP0), y, x)
            st = set_block(st, R_M0, machine)
            st = set_block(st, R_NB0, nbrs)
            st = set_block(st, R_NP0, needp)
            # shift remaining freed card to slot 0
            shift = (card_i == 0) & (st[R_FREED, 1, 0] != EMPTY)
            f1 = st[R_FREED, 1]
            st = st.at[R_FREED, 0].set(jnp.where(shift, f1, st[R_FREED, 0]))
            st = st.at[R_FREED, 1].set(
                jnp.where(shift, jnp.zeros(7, jnp.int8), f1))
            score = compute_score(machine)
            st = st.at[R_MISC, 1, 0].set(score.astype(jnp.int8))
            return next_status_after_build(st)

        def b_throw(st):
            st = st.at[R_FREED, 0:2].set(jnp.zeros((2, 7), jnp.int8))
            return next_status_after_build(st)

        branch = jnp.where(action < 15, 0,
                  jnp.where(action < 30, 1,
                   jnp.where(action < 35, 2,
                    jnp.where(action < A_THROW, 3, 4))))
        state = jax.lax.switch(branch, [b_register, b_middle, b_swap_mecabot,
                                        b_expand, b_throw], state)

        # tail (reference make_move, :215-230)
        s = _i32(state)
        status, main = s[R_MISC, 0, 1], s[R_MISC, 0, 2]
        arr_empty = jnp.all(s[R_ARR, :3, 0] == EMPTY)
        state = jax.lax.cond(
            (status == ST_PUT) & arr_empty,
            lambda st: draw_cards(st, key, seed, 3, R_ARR),
            lambda st: st, state)

        is_put = status == ST_PUT
        state = state.at[R_MISC, 0, 0].add(
            jnp.where(is_put, 1, 0).astype(jnp.int8))
        new_main = jnp.where(is_put, 1 - main, main)
        state = state.at[R_MISC, 0, 2].set(new_main.astype(jnp.int8))
        is_main_turn = (status == ST_MAIN_EXPAND) | (status == ST_MAIN_SWAP)
        nxt = jnp.where(is_put, new_main,
                        jnp.where(is_main_turn, main, 1 - main))
        return state, nxt.astype(jnp.int32)

    # -------- canonicalization (reference swap_players, :254-284) ------------

    def canonical(state, swap):
        st = state
        st = st.at[R_REG0].set(state[R_REG1])
        st = st.at[R_REG1].set(state[R_REG0])
        st = st.at[R_FREED, 0:2].set(state[R_FREED, 2:4])
        st = st.at[R_FREED, 2:4].set(state[R_FREED, 0:2])
        for a, b in ((R_M0, R_M1), (R_NB0, R_NB1), (R_NP0, R_NP1)):
            st = st.at[a:a + NB_ROWS].set(state[b:b + NB_ROWS])
            st = st.at[b:b + NB_ROWS].set(state[a:a + NB_ROWS])
        st = st.at[R_MISC, 1, 0].set(state[R_MISC, 1, 1])
        st = st.at[R_MISC, 1, 1].set(state[R_MISC, 1, 0])
        st = st.at[R_MISC, 0, 2].set(1 - state[R_MISC, 0, 2])
        status = _i32(state)[R_MISC, 0, 1]
        new_status = jnp.where(status > ST_PUT, (status + 1) % 4 + 1, status)
        st = st.at[R_MISC, 0, 1].set(new_status.astype(jnp.int8))
        return jnp.where(swap % 2 == 0, state, st)

    def terminal(state):
        """reference check_end_game (:235-252)."""
        s = _i32(state)
        alive = jnp.any(s[R_MISC, 3:5, :] != 0) | \
            jnp.any(s[R_ARR, :3, 0] != EMPTY) | \
            jnp.any(s[R_FREED, :4, 0] != EMPTY)
        sc0, sc1 = s[R_MISC, 1, 0], s[R_MISC, 1, 1]
        n0 = jnp.sum(get_block(s, R_M0)[:, :, 0] != 0)
        n1 = jnp.sum(get_block(s, R_M1)[:, :, 0] != 0)
        p0_adv = (sc0 > sc1) | ((sc0 == sc1) & (n0 > n1))
        p1_adv = (sc1 > sc0) | ((sc0 == sc1) & (n1 > n0))
        res = jnp.where(p0_adv, jnp.array([1.0, -1.0]),
                        jnp.where(p1_adv, jnp.array([-1.0, 1.0]),
                                  jnp.array([0.01, 0.01])))
        return jnp.where(alive, 0.0, res).astype(jnp.float32)

    def get_score(state, player):
        return _i32(state)[R_MISC, 1, player].astype(jnp.float32)

    def get_round(state):
        return _i32(state)[R_MISC, 0, 0]

    def init(key):
        state = jnp.zeros((N_ROWS, 5, 7), jnp.int8)
        # all 13 bits available per color: 0x1FFF -> bytes (31, 255)
        state = state.at[R_MISC, 3, :5].set(31)
        state = state.at[R_MISC, 4, :5].set(-1)
        # 5 middle cards then 3 arrival cards, all PRNG
        state = draw_cards(state, jax.random.fold_in(key, 100),
                           jnp.int32(0), 5, R_MID)
        state = draw_cards(state, jax.random.fold_in(key, 200),
                           jnp.int32(0), 3, R_ARR)
        # source cards + optim planes (reference _init_machines, :606-613)
        m0 = get_block(_i32(state), R_M0).at[SRC_Y, SRC_X].set(source_card)
        nb0, np0 = update_optims(m0, get_block(_i32(state), R_NB0),
                                 get_block(_i32(state), R_NP0),
                                 SRC_Y, SRC_X)
        state = set_block(state, R_M0, m0)
        state = set_block(state, R_NB0, nb0)
        state = set_block(state, R_NP0, np0)
        state = set_block(state, R_M1, m0)
        state = set_block(state, R_NB1, nb0)
        state = set_block(state, R_NP1, np0)
        state = state.at[R_MISC, 0, 3:5].set(1)
        return state

    def observe(state):
        return state.astype(jnp.float32)

    # -------- symmetries (reference get_symmetries, :286-409) ----------------

    perms_arr = jnp.asarray(PERMS_ARRIVAL)
    perms_reg = jnp.asarray(PERMS_REGISTER)

    def _mirror_machine(m):
        m2 = m[:, ::-1, :]
        e, w = m2[:, :, EAST], m2[:, :, WEST]
        return m2.at[:, :, EAST].set(w).at[:, :, WEST].set(e)

    def _mirror_expand_polval(s, pi, va):
        """Expand-action remap under the P0-machine mirror; orientation
        permutation depends on each freed card's type (reference :307-323)."""
        card_type = _i32(s)[R_FREED, 0:2, 2]                   # (2,)
        perm_angle = jnp.asarray([1, 0, 3, 2])
        perm_other = jnp.asarray([0, 3, 2, 1])
        perm = jnp.where((card_type == PIPE2_ANGLE)[:, None],
                         perm_angle[None], perm_other[None])   # (2,4)
        ci = jnp.arange(2)[:, None, None, None]
        y = jnp.arange(M)[None, :, None, None]
        x = jnp.arange(M)[None, None, :, None]
        o = jnp.arange(4)[None, None, None, :]
        src = 35 + 4 * (MM * ci + M * y + (M - 1 - x)) + perm[ci, o]
        src = src.reshape(8 * MM)
        new_pi = pi.at[35:35 + 8 * MM].set(pi[src])
        new_va = va.at[35:35 + 8 * MM].set(va[src])
        return new_pi, new_va

    def symmetries(state, pi, valid):
        outs_s, outs_p, outs_v = [state], [pi], [valid]

        s = _i32(state)
        # 1) mirror P0 machine (+ its optim planes, for NN consistency; the
        # reference leaves optims stale since its NN ignores them)
        st = set_block(state, R_M0, _mirror_machine(get_block(s, R_M0)))
        st = set_block(st, R_NB0, _mirror_machine(get_block(s, R_NB0)))
        st = set_block(st, R_NP0, _mirror_machine(get_block(s, R_NP0)))
        p2, v2 = _mirror_expand_polval(s, pi, valid)
        outs_s.append(st)
        outs_p.append(p2)
        outs_v.append(v2)

        # 2) mirror P1 machine (policy unchanged)
        st = set_block(state, R_M1, _mirror_machine(get_block(s, R_M1)))
        st = set_block(st, R_NB1, _mirror_machine(get_block(s, R_NB1)))
        st = set_block(st, R_NP1, _mirror_machine(get_block(s, R_NP1)))
        outs_s.append(st)
        outs_p.append(pi)
        outs_v.append(valid)

        # 3) swap the two freed cards (identity fallback when not possible)
        both = jnp.all(s[R_FREED, 0:2, 0] != EMPTY)
        st = state.at[R_FREED, 0].set(state[R_FREED, 1])
        st = st.at[R_FREED, 1].set(state[R_FREED, 0])
        blk0 = slice(35, 35 + 4 * MM)
        blk1 = slice(35 + 4 * MM, 35 + 8 * MM)
        p2 = pi.at[blk0].set(pi[blk1]).at[blk1].set(pi[blk0])
        v2 = valid.at[blk0].set(valid[blk1]).at[blk1].set(valid[blk0])
        outs_s.append(jnp.where(both, st, state))
        outs_p.append(jnp.where(both, p2, pi))
        outs_v.append(jnp.where(both, v2, valid))

        # 4) arrival permutations (3)
        for k in range(3):
            perm = perms_arr[k]                    # i -> new_i
            inv = jnp.zeros(3, jnp.int32).at[perm].set(jnp.arange(3))
            st = state.at[R_ARR, 0:3].set(state[R_ARR, inv])
            slots = jnp.arange(5)
            src_a = (5 * inv[:, None] + slots[None]).reshape(15)
            p2 = pi.at[0:15].set(pi[src_a]).at[15:30].set(pi[15 + src_a])
            v2 = valid.at[0:15].set(valid[src_a]) \
                      .at[15:30].set(valid[15 + src_a])
            outs_s.append(st)
            outs_p.append(p2)
            outs_v.append(v2)

        # 5) register permutations (5): slots of both registers + middle move
        # together; policy blocks z*5+slot for z in 0..6 (actions 0..34)
        for k in range(5):
            perm = perms_reg[k]
            inv = jnp.zeros(5, jnp.int32).at[perm].set(jnp.arange(5))
            st = state.at[R_REG0].set(state[R_REG0][inv])
            st = st.at[R_REG1].set(state[R_REG1][inv])
            st = st.at[R_MID].set(state[R_MID][inv])
            zs = jnp.arange(7)
            src_a = (5 * zs[:, None] + inv[None]).reshape(35)
            p2 = pi.at[0:35].set(pi[src_a])
            v2 = valid.at[0:35].set(valid[src_a])
            outs_s.append(st)
            outs_p.append(p2)
            outs_v.append(v2)

        # 6) color rolls (2): rotate colors 2..6 in every card row; we also
        # roll the deck bitfield columns (the reference leaves them stale)
        def roll_colors(st, nroll):
            s2 = _i32(st)
            col = s2[:, :, 0]
            is_card = (col != EMPTY) & (col != SOURCE)
            rows_geo = jnp.zeros(N_ROWS, bool) \
                .at[R_ARR:R_FREED + 1].set(True) \
                .at[R_M0:R_M0 + 2 * NB_ROWS].set(True)
            is_card &= rows_geo[:, None]
            new_col = ((col - 2) + nroll) % 5 + 2
            st = st.at[:, :, 0].set(
                jnp.where(is_card, new_col, col).astype(jnp.int8))
            inv_roll = jnp.mod(jnp.arange(5) - nroll, 5)
            st = st.at[R_MISC, 3, :5].set(st[R_MISC, 3, inv_roll])
            st = st.at[R_MISC, 4, :5].set(st[R_MISC, 4, inv_roll])
            return st

        for nroll in (2, 4):
            outs_s.append(roll_colors(state, nroll))
            outs_p.append(pi)
            outs_v.append(valid)

        return (jnp.stack(outs_s), jnp.stack(outs_p), jnp.stack(outs_v))

    return GameSpec(
        name="botanik",
        num_players=2,
        state_shape=(N_ROWS, 5, 7),
        obs_shape=(N_ROWS, 5, 7),
        num_actions=NUM_ACTIONS,
        max_game_length=400,
        init=init,
        valids=valids,
        step=step,
        canonical=canonical,
        terminal=terminal,
        observe=observe,
        get_round=get_round,
        get_score=get_score,
        symmetries=symmetries,
        num_symmetries=14,
        meta=BotanikMeta(num_players=2),
    )
