"""The Little Prince — TPU-native vectorized engine (3-5 players).

Behavioral reference: /root/reference/thelittleprince/TLPLogicNumba.py
(538 LoC).  Drafting game where the action chooses both a market card and the
NEXT PLAYER (action = card*n + player_delta), with market refills as the
chance node.

Reference quirks preserved:
- _take_card with no free slot writes through index -1 into the LAST row of
  the players_cards block (the card overwrites another player's slot 15)
- GEOGRAPHER counts non-corner SLOTS without volcanoes, including empty ones
- the volcano penalty writes into every player's FACE_DOWN score column and
  only runs when the scored player has at least one character
- market refill candidate type is weighted by which of PLAYER 0's type slots
  are still open (canonical player 0 = the mover)

Chance seeds: the reference draws via np.random with no seeded path; here
seed==0 uses the PRNG key and seed>0 decodes deterministic picks
k_j = (seed-1 >> 5j) & 31 (j = 0 type pick, 1..n card picks), giving both
search universes and exact-draw injection for parity tests (each pick is
"the k-th available item", the reference's searchsorted-on-normalized-cumsum
semantics for uniform u in ((k)/count, (k+1)/count)).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from alphazero_tpu.games.base import GameSpec
from alphazero_tpu.games.tlp_data import (
    ALL_CARDS, BAOBAB, BIG_STAR, BOX, CARD_TYPE, CENTER, CORNER,
    DOWNHILL_EDGE, ELEPHANT, EMPTY, FACE_DOWN, FOX, LAMPPOST, ROSE, SLOTS,
    SNAKE, SUNSET, SHEEP_BROWN, SHEEP_GREY, SHEEP_WHITE, UPHILL_EDGE, VOLCANO,
    ASTRONOMER, BUSINESSMAN_B, BUSINESSMAN_G, BUSINESSMAN_W, DRUNKARD,
    GARDENER, GEOGRAPHER, HUNTER, KING, LAMPLIGHTER, LITTLE_PRINCE, NONE,
    TURKISH, VAIN_MAN)

_BIT_SHIFTS = np.arange(7, -1, -1, dtype=np.int32)
# slot preference order per card-type index 1..4 (reference slots_in_planet)
_SLOT_TABLE = np.array([SLOTS[CENTER], SLOTS[UPHILL_EDGE],
                        SLOTS[DOWNHILL_EDGE], SLOTS[CORNER]], np.int32)
# "last slot of each type" used for refill type weighting (reference :367-372)
_TYPE_ROOM_SLOT = np.array([10, 14, 13, 15], np.int32)
_NON_CORNER = np.array([i for i in range(16) if i not in SLOTS[CORNER]],
                       np.int32)


@dataclasses.dataclass(frozen=True)
class TLPMeta:
    num_players: int


def make_tlp(num_players: int = 3) -> GameSpec:
    if num_players not in (3, 4, 5):
        raise ValueError("The Little Prince supports 3-5 players")
    n = num_players
    rows = 18 * n + 1
    A = n * n
    R_MARKET = 1
    R_SCORE = n + 1
    R_CARDS = 2 * n + 1

    cards_tbl = jnp.asarray(ALL_CARDS.reshape(80, 15))    # (80,15)
    bit_shifts = jnp.asarray(_BIT_SHIFTS)
    slot_tbl = jnp.asarray(_SLOT_TABLE)
    type_room = jnp.asarray(_TYPE_ROOM_SLOT)
    non_corner = jnp.asarray(_NON_CORNER)

    def _i32(s):
        return s.astype(jnp.int32)

    def unpack8(v):
        return ((v.astype(jnp.int32) & 0xFF) >> bit_shifts) & 1

    def pack8_i8(bits):
        v = jnp.sum(bits.astype(jnp.int32) << bit_shifts)
        return jnp.where(v > 127, v - 256, v).astype(jnp.int8)

    def who_can_play(s):
        return unpack8(s[0, 2])[:n]

    def available_cards(s):
        return jax.vmap(unpack8)(s[0, 3:13]).reshape(80)

    def set_available(state, avail):
        packed = jax.vmap(pack8_i8)(avail.reshape(10, 8))
        return state.at[0, 3:13].set(packed)

    def pick_kth_available(avail, k):
        """Index of the k-th (0-based) available item; the reference's
        searchsorted(normalized-cumsum, u) with u in (k/c, (k+1)/c)."""
        order = jnp.cumsum(avail)
        return jnp.argmax((order == k + 1) & (avail == 1)).astype(jnp.int32)

    def draw_pick(avail, u, seed, j):
        """One pick among available items: u (uniform) when seed==0, else
        k_j decoded from the seed."""
        count = jnp.maximum(jnp.sum(avail), 1)
        k_rand = jnp.floor(u * count).astype(jnp.int32)
        k_det = ((seed - 1) >> (5 * j)) & 31
        k = jnp.where(seed == 0, k_rand, k_det) % count
        return pick_kth_available(avail, k)

    # ---------------- scoring (reference _update_score, :299-361) ----------

    def update_score(state, p):
        s = _i32(state)
        cards = jax.lax.dynamic_slice(
            s, (jnp.asarray(R_CARDS + 16 * p, jnp.int32), jnp.int32(0)),
            (16, 15))
        attrs = jnp.sum(cards, axis=0)                    # (15,)
        score = jnp.zeros(15, jnp.int32)

        corner_types = cards[jnp.asarray(SLOTS[CORNER]), CARD_TYPE]
        chars = jnp.maximum(corner_types - CORNER, 0)     # (4,)

        geo_count = jnp.sum(cards[non_corner, VOLCANO] == 0)
        roses_tbl = jnp.asarray([0, 14, 7, 0], jnp.int32)
        sheep_w, sheep_g, sheep_b = (attrs[SHEEP_WHITE], attrs[SHEEP_GREY],
                                     attrs[SHEEP_BROWN])

        def add_char(score, ch):
            score = jnp.where(ch == VAIN_MAN,
                              score.at[SNAKE].add(4 * attrs[SNAKE]), score)
            score = jnp.where(ch == GEOGRAPHER,
                              score.at[VOLCANO].add(geo_count), score)
            score = jnp.where(ch == ASTRONOMER,
                              score.at[SUNSET].add(2 * attrs[SUNSET]), score)
            score = jnp.where(ch == KING, score.at[ROSE].add(
                roses_tbl[jnp.minimum(attrs[ROSE], 3)]), score)
            score = jnp.where(ch == LAMPLIGHTER,
                              score.at[LAMPPOST].add(attrs[LAMPPOST]), score)
            hunter = (score.at[SNAKE].add(jnp.where(attrs[SNAKE] > 0, 3, 0))
                      .at[ELEPHANT].add(jnp.where(attrs[ELEPHANT] > 0, 3, 0)))
            hunter_sheep = jnp.where(
                sheep_w > 0, hunter.at[SHEEP_WHITE].add(3),
                jnp.where(sheep_g > 0, hunter.at[SHEEP_GREY].add(3),
                          jnp.where(sheep_b > 0,
                                    hunter.at[SHEEP_BROWN].add(3), hunter)))
            score = jnp.where(ch == HUNTER, hunter_sheep, score)
            score = jnp.where(ch == DRUNKARD,
                              score.at[BAOBAB].add(3 * attrs[FACE_DOWN]),
                              score)
            score = jnp.where(ch == BUSINESSMAN_W,
                              score.at[SHEEP_WHITE].add(2 * sheep_w), score)
            score = jnp.where(ch == BUSINESSMAN_G,
                              score.at[SHEEP_GREY].add(3 * sheep_g), score)
            score = jnp.where(ch == BUSINESSMAN_B,
                              score.at[SHEEP_BROWN].add(5 * sheep_b), score)
            score = jnp.where(ch == GARDENER,
                              score.at[BAOBAB].add(7 * attrs[BAOBAB]), score)
            score = jnp.where(ch == TURKISH,
                              score.at[BIG_STAR].add(attrs[BIG_STAR]), score)
            lp = score.at[BOX].add(attrs[BOX])
            lp = jnp.where(sheep_w > 0, lp.at[SHEEP_WHITE].add(3), lp)
            lp = jnp.where(sheep_g > 0, lp.at[SHEEP_GREY].add(3), lp)
            lp = jnp.where(sheep_b > 0, lp.at[SHEEP_BROWN].add(3), lp)
            score = jnp.where(ch == LITTLE_PRINCE, lp, score)
            return score

        for i in range(4):
            score = add_char(score, chars[i])

        state = jax.lax.dynamic_update_slice(
            state, score.astype(jnp.int8)[None],
            (jnp.asarray(R_SCORE + p, jnp.int32), jnp.int32(0)))

        # volcano penalty on every player (reference :349-354), only when the
        # scored player has >= 1 character
        any_char = jnp.any(chars > 0)
        vol = jnp.stack([jnp.sum(s[R_CARDS + 16 * q:R_CARDS + 16 * (q + 1),
                                   VOLCANO]) for q in range(n)])
        # recompute the scored player's volcano count from updated cards
        vmax = jnp.max(vol)
        pen = jnp.where(vol == vmax, -vmax, 0).astype(jnp.int8)
        cur = state[R_SCORE:R_SCORE + n, FACE_DOWN]
        state = state.at[R_SCORE:R_SCORE + n, FACE_DOWN].set(
            jnp.where(any_char, pen, cur))
        return state

    # ---------------- market refill (reference :363-396) -------------------

    def fill_market_if_needed(state, key, seed):
        s = _i32(state)
        market_types = s[R_MARKET:R_MARKET + n, CARD_TYPE]
        need = (jnp.all(market_types == EMPTY)
                & ~jnp.all(s[R_CARDS:R_CARDS + 16 * n, CARD_TYPE] > 0))

        def refill(state):
            s = _i32(state)
            room = (s[R_CARDS + type_room, CARD_TYPE] == EMPTY).astype(
                jnp.int32)                                 # player 0's slots
            k0, *kc = jax.random.split(key, n + 1)
            u0 = jax.random.uniform(k0)
            ct = draw_pick(room, u0, seed, 0)              # card type 0..3
            avail = available_cards(s)
            type_block = jax.lax.dynamic_slice(avail, (20 * ct,), (20,))
            for i in range(n):
                ui = jax.random.uniform(kc[i])
                ci = draw_pick(type_block, ui, seed, i + 1)
                card = cards_tbl[20 * ct + ci]
                state = jax.lax.dynamic_update_slice(
                    state, card.astype(jnp.int8)[None],
                    (jnp.asarray(R_MARKET + i, jnp.int32), jnp.int32(0)))
                type_block = type_block.at[ci].set(0)
            avail = jax.lax.dynamic_update_slice(avail, type_block, (20 * ct,))
            state = set_available(state, avail)
            # reset who-can-play to everyone (reference :384)
            ones = jnp.concatenate([jnp.ones(n, jnp.int32),
                                    jnp.zeros(8 - n, jnp.int32)])
            state = state.at[0, 2].set(pack8_i8(ones))
            return state

        return jax.lax.cond(need, refill, lambda st: st, state)

    # ---------------- GameSpec functions ----------------

    def valids(state):
        s = _i32(state)
        wcp = who_can_play(s).at[0].set(0)
        wcp = jnp.where(jnp.any(wcp > 0), wcp, wcp.at[0].set(1))
        can_pick = s[R_MARKET:R_MARKET + n, CARD_TYPE] != EMPTY
        return (can_pick[:, None] & (wcp > 0)[None, :]).reshape(A)

    def step(state, action, key, seed):
        action = jnp.asarray(action, jnp.int32)
        seed = jnp.asarray(seed, jnp.int32)
        p = 0
        card_i, delta = action // n, action % n
        s = _i32(state)

        # --- take card (reference _take_card, :280-296) ---
        mcard = jax.lax.dynamic_slice(
            s, (R_MARKET + card_i, jnp.int32(0)), (1, 15))[0]
        ctype_idx = jnp.clip(mcard[CARD_TYPE] // 25, 1, 4) - 1
        slots = slot_tbl[ctype_idx]                        # (4,)
        slot_types = s[R_CARDS + slots, CARD_TYPE]
        free = slot_types == EMPTY
        has_free = jnp.any(free)
        slot = slots[jnp.argmax(free)]
        # reference bug preserved: no free slot => write via index -1, i.e.
        # the LAST row of the players_cards block
        dest = jnp.where(has_free, R_CARDS + slot, rows - 1).astype(jnp.int32)
        state = jax.lax.dynamic_update_slice(
            state, mcard.astype(jnp.int8)[None], (dest, jnp.int32(0)))
        state = jax.lax.dynamic_update_slice(
            state, jnp.zeros((1, 15), jnp.int8),
            (R_MARKET + card_i, jnp.int32(0)))

        # baobab face-down rule (reference :291-296)
        s = _i32(state)
        my = s[R_CARDS:R_CARDS + 16]
        flip = jnp.sum(my[:, BAOBAB]) >= 3
        has_baobab = my[:, BAOBAB] >= 1
        flipped = my.at[:, :CARD_TYPE].set(
            jnp.where(has_baobab[:, None], 0, my[:, :CARD_TYPE]))
        flipped = flipped.at[:, FACE_DOWN].set(
            jnp.where(has_baobab, 1, my[:, FACE_DOWN]))
        new_my = jnp.where(flip, flipped, my)
        state = jax.lax.dynamic_update_slice(
            state, new_my.astype(jnp.int8), (R_CARDS, 0))

        state = update_score(state, jnp.int32(p))
        state = fill_market_if_needed(state, key, seed)

        # clear the mover's can-play bit (reference :398-401)
        wcp = who_can_play(_i32(state)).at[0].set(0)
        packed = pack8_i8(jnp.concatenate(
            [wcp, jnp.zeros(8 - n, wcp.dtype)]))
        state = state.at[0, 2].set(packed)

        state = state.at[0, 0].add(1)                      # round
        state = state.at[0, 1].set(delta.astype(jnp.int8))  # current player
        return state, delta

    def canonical(state, swap):
        k = swap % n

        def roll_block(st, r0, per, total):
            block = jax.lax.dynamic_slice(st, (r0, 0), (total, 15))
            return jax.lax.dynamic_update_slice(
                st, jnp.roll(block, -k * per, axis=0), (r0, 0))

        st = roll_block(state, R_SCORE, 1, n)
        st = roll_block(st, R_CARDS, 16, 16 * n)
        st = st.at[0, 1].set(
            ((state[0, 1].astype(jnp.int32) - k + n) % n).astype(jnp.int8))
        wcp = who_can_play(_i32(state))
        st = st.at[0, 2].set(pack8_i8(jnp.concatenate(
            [jnp.roll(wcp, -k), jnp.zeros(8 - n, wcp.dtype)])))
        return jnp.where(k == 0, state, st)

    def terminal(state):
        s = _i32(state)
        ended = s[0, 0] >= 16 * n
        scores = jnp.sum(s[R_SCORE:R_SCORE + n], axis=1)
        smax = jnp.max(scores)
        single = jnp.sum(scores == smax) == 1
        res = jnp.where(scores == smax,
                        jnp.where(single, 1.0, 0.01), -1.0)
        return jnp.where(ended, res, 0.0).astype(jnp.float32)

    def get_score(state, player):
        s = _i32(state)
        return jnp.sum(jax.lax.dynamic_slice(
            s, (jnp.asarray(R_SCORE + player, jnp.int32), jnp.int32(0)),
            (1, 15))).astype(jnp.float32)

    def get_round(state):
        return state[0, 0].astype(jnp.int32)

    def init(key):
        state = jnp.zeros((rows, 15), jnp.int8)
        ones_n = jnp.concatenate([jnp.ones(n, jnp.int32),
                                  jnp.zeros(8 - n, jnp.int32)])
        state = state.at[0, 2].set(pack8_i8(ones_n))
        full = jnp.ones(8, jnp.int32)
        state = state.at[0, 3:13].set(jnp.broadcast_to(pack8_i8(full), (10,)))
        return fill_market_if_needed(state, key, jnp.int32(0))

    def observe(state):
        return state.astype(jnp.float32)

    # market-slot permutations (subset of the reference's randomized
    # symmetries, get_symmetries :184-275 — fixed-shape deterministic set)
    import itertools
    perms = list(itertools.permutations(range(n)))
    row_g, act_g = [], []
    for perm in perms:
        rp = np.arange(rows)
        ap = np.arange(A)
        for i, q in enumerate(perm):
            rp[R_MARKET + i] = R_MARKET + q
            ap[i * n:(i + 1) * n] = np.arange(q * n, (q + 1) * n)
        row_g.append(rp)
        act_g.append(ap)
    sym_rows = jnp.asarray(np.stack(row_g), jnp.int32)
    sym_acts = jnp.asarray(np.stack(act_g), jnp.int32)

    def symmetries(state, pi, valid):
        return state[sym_rows], pi[sym_acts], valid[sym_acts]

    return GameSpec(
        name=f"tlp_{n}p",
        num_players=n,
        state_shape=(rows, 15),
        obs_shape=(rows, 15),
        num_actions=A,
        max_game_length=16 * n + 2,
        init=init,
        valids=valids,
        step=step,
        canonical=canonical,
        terminal=terminal,
        observe=observe,
        get_round=get_round,
        get_score=get_score,
        symmetries=symmetries,
        num_symmetries=len(perms),
        meta=TLPMeta(num_players=n),
    )
