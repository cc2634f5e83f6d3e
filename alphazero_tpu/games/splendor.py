"""Splendor — TPU-native vectorized engine with chance nodes.

Behavioral reference: /root/reference/splendor/SplendorLogicNumba.py (Board
jitclass, 479 LoC) + SplendorLogic.py data tables.  From-scratch functional
JAX implementation: every valid-move family and move family is a broadcasted
tensor expression; the deck bitfields and the deterministic per-universe LCG
card draw are reproduced bit-exactly (the LCG product is computed in modular
arithmetic so int32 suffices on TPU).

State (2 players): (56, 7) int8, reference layout (SplendorLogicNumba.py:6-51):
  row 0        bank gems (white..black, gold, points=round counter)
  rows 1-24    12 visible cards x (cost row, gain row)
  rows 25-30   decks: per tier (count-per-color row, bitfield row)
  rows 31-33   nobles in bank
  rows 34-35   player gems
  rows 36-41   player nobles (3 slots each)
  rows 42-43   player cards (+points)
  rows 44-55   player reserved cards (3 x 2 rows each)

Actions (81, SplendorLogicNumba.py:53-84): 12 buy visible, 12 reserve
visible, 3 reserve from deck, 3 buy reserved, 25 take-different-gems,
5 take-2-identical, 15 give-different, 5 give-2-identical, 1 pass.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from alphazero_tpu.games.base import GameSpec
from alphazero_tpu.games.splendor_data import (
    CARDS_TIER1, CARDS_TIER2, CARDS_TIER3, CARD_PERMS, DECK_SIZES,
    GEMS_UP_TO_2, GEMS_UP_TO_3, NOBLES, RESERVE_PERMS)

IDX_GOLD, IDX_POINTS = 5, 6
NUM_ACTIONS = 81
LCG_A = 4594591  # reference SplendorLogicNumba.py:321

# all card tables padded to (3, 5, 8, 2, 7)
_ALL_CARDS_NP = np.zeros((3, 5, 8, 2, 7), np.int8)
_ALL_CARDS_NP[0, :, :8] = CARDS_TIER1
_ALL_CARDS_NP[1, :, :6] = CARDS_TIER2
_ALL_CARDS_NP[2, :, :4] = CARDS_TIER3

# bit i of the bitfield corresponds to mask 128 >> i
# (reference my_packbits/my_unpackbits, SplendorLogicNumba.py:87,103-110)
_BIT_SHIFTS = np.arange(7, -1, -1, dtype=np.int32)
# seed hash weights 2**(5c) (reference mask2, SplendorLogicNumba.py:88)
_SEED_W = (2 ** (5 * np.arange(5))).astype(np.int32)


@dataclasses.dataclass(frozen=True)
class SplendorMeta:
    num_players: int
    num_nobles: int
    gems_in_play: int
    max_moves: int


def make_splendor(num_players: int = 2) -> GameSpec:
    if num_players not in (2, 3, 4):
        raise ValueError("Splendor supports 2-4 players")
    n = num_players
    num_nobles = {2: 3, 3: 4, 4: 5}[n]
    gems_in_play = {2: 4, 3: 5, 4: 7}[n]
    max_moves = 62 * n
    score_win = 15
    num_rows = 32 + 10 * n + n * n

    # row offsets (reference copy_state, SplendorLogicNumba.py:207-219)
    R_BANK = 0
    R_CARDS = 1                    # 24 rows
    R_DECK = 25                    # 6 rows
    R_NOBLES = 31                  # num_nobles rows
    R_PGEMS = 32 + n
    R_PNOBLES = 32 + 2 * n         # n * num_nobles rows
    R_PCARDS = 32 + 3 * n + n * n
    R_PRESERVED = 32 + 4 * n + n * n  # 6 per player

    all_cards_flat = jnp.asarray(
        _ALL_CARDS_NP.reshape(120, 14).astype(np.int32))  # (120,14)
    nobles_tbl = jnp.asarray(NOBLES)                # (10,7)
    gems3 = jnp.asarray(GEMS_UP_TO_3[:, :5], jnp.int32)   # (25,5)
    gems2 = jnp.asarray(GEMS_UP_TO_2[:, :5], jnp.int32)   # (15,5)
    bit_shifts = jnp.asarray(_BIT_SHIFTS)
    seed_w = jnp.asarray(_SEED_W)
    deck_sizes = jnp.asarray(DECK_SIZES, jnp.int32)

    # ---------------- bitfield helpers ----------------

    def unpack8(v):
        """int8 scalar -> (8,) 0/1 in reference bit order (MSB first)."""
        return ((v.astype(jnp.int32) & 0xFF) >> bit_shifts) & 1

    def pack8(bits):
        return jnp.sum(bits.astype(jnp.int32) << bit_shifts).astype(jnp.int32)

    # ---------------- state views ----------------

    def _i32(state):
        return state.astype(jnp.int32)

    def bank_of(s):
        return s[R_BANK]

    def pgems(s, p):
        return s[R_PGEMS + p]

    def pcards(s, p):
        return s[R_PCARDS + p]

    # ---------------- masked row addressing ----------------
    # Traced-index row reads/writes are expressed as masked arithmetic over
    # STATICALLY-indexed blocks, never as per-lane dynamic gathers/scatters
    # on the state: under vmap those lower to (B, rows, 7) scatter/gather
    # ops that dominate the TPU step cost (measured: step_canonical was
    # ~31 us/lane at B=2048 before this rewrite — the same
    # gather-vs-masked-reduce asymmetry scripts/platform_probe.py measures
    # and search/tree.py already exploits).

    iota3 = jnp.arange(3)
    iota6 = jnp.arange(6)
    iota24 = jnp.arange(24)

    def pick_row(block32, sel):
        """Select ONE row of an int32 (K, 7) block by a (K,) bool mask."""
        return jnp.sum(jnp.where(sel[:, None], block32, 0), axis=0)

    def put_card(block, slot, card):
        """Write a (2, 7) card into rows (2*slot, 2*slot+1) of an int8
        (2K, 7) block — masked write, static indexing."""
        k2 = block.shape[0]
        io = iota24[:k2]
        sel = (io // 2) == slot
        val = jnp.where((io % 2 == 0)[:, None], card[0][None], card[1][None])
        return jnp.where(sel[:, None], val, block)

    # ---------------- deck draw (the chance node) ----------------

    def draw_deck_card(state, tier, key, seed):
        """Remove one card from deck `tier` and return (state, card (2,7),
        has_card).  seed != 0 reproduces the reference LCG bit-exactly
        (SplendorLogicNumba.py:306-336); seed == 0 uses the PRNG key with the
        same two-stage distribution (color ∝ count, then uniform card)."""
        s = _i32(state)
        tier_oh = iota3 == tier                                 # (3,)
        counts3 = s[R_DECK:R_DECK + 6:2, :5]                    # (3,5) static
        bits3 = s[R_DECK + 1:R_DECK + 6:2, :5]                  # (3,5) static
        counts = pick_row(counts3, tier_oh)                     # per color
        bits_row = pick_row(bits3, tier_oh)                     # bitfields
        bits = jax.vmap(unpack8)(bits_row)                      # (5,8)
        total = jnp.sum(counts)
        has_card = total > 0

        # deterministic path: flat (color-major, index-ascending) enumeration
        flat = bits.reshape(40)
        order = jnp.cumsum(flat)                                # 1-based rank
        seed2 = jnp.sum((bits_row & 0xFF) * seed_w)
        L = jnp.maximum(total, 1)
        det_rank = ((LCG_A % L) * ((seed + seed2) % L)) % L     # 0-based
        det_pick = jnp.argmax((order == det_rank + 1) & (flat == 1))

        # true-random path: color ~ counts, then uniform among color's bits
        k1, k2 = jax.random.split(key)
        color_r = jax.random.categorical(
            k1, jnp.where(counts > 0, 0.0, -jnp.inf) +
            jnp.log(jnp.maximum(counts, 1).astype(jnp.float32)))
        card_logits = jnp.where(bits[color_r] == 1, 0.0, -jnp.inf)
        idx_r = jax.random.categorical(k2, card_logits)
        rand_pick = color_r * 8 + idx_r

        pick = jnp.where(seed == 0, rand_pick, det_pick)
        color, idx = pick // 8, pick % 8

        # clear bit (color, idx) and decrement the color count by masked
        # arithmetic (tiny fixed shapes, no per-lane scatter)
        hit = ((jnp.arange(5)[:, None] == color)
               & (jnp.arange(8)[None] == idx))                 # (5,8)
        new_bits_row = jax.vmap(pack8)(jnp.where(hit, 0, bits))
        new_counts = counts - (jnp.arange(5) == color)
        write = tier_oh[:, None] & has_card
        state = state.at[R_DECK:R_DECK + 6:2, :5].set(
            jnp.where(write, new_counts[None], counts3).astype(jnp.int8))
        state = state.at[R_DECK + 1:R_DECK + 6:2, :5].set(
            jnp.where(write, new_bits_row[None], bits3).astype(jnp.int8))
        # card lookup: masked reduce over the flat 120-card table instead of
        # a per-lane gather
        flat = tier * 40 + pick
        card = jnp.sum(
            jnp.where((jnp.arange(120) == flat)[:, None], all_cards_flat, 0),
            axis=0).astype(jnp.int8).reshape(2, 7)
        card = jnp.where(has_card, card, jnp.zeros((2, 7), jnp.int8))
        return state, card, has_card

    def fill_new_card(state, tier, index, key, seed):
        """Empty visible slot then refill from deck
        (reference _fill_new_card, :338-342).  Writes card (zeros when the
        deck is empty) into visible slot 4*tier+index by masked write; a
        slot >= 12 (deck-reserve dead branch) writes nowhere."""
        state, card, has = draw_deck_card(state, tier, key, seed)
        block = state[R_CARDS:R_CARDS + 24]
        block = put_card(block, 4 * tier + index, card)
        return state.at[R_CARDS:R_CARDS + 24].set(block)

    # ---------------- buying helper ----------------

    def give_nobles_if_earned(state, player):
        """(reference _give_nobles_if_earned, :465-470)"""
        s = _i32(state)
        nobles = s[R_NOBLES:R_NOBLES + num_nobles]              # (K,7)
        cards = pcards(s, player)[:5]
        present = jnp.sum(nobles[:, :5], axis=1) > 0
        earned = present & jnp.all(cards[None] >= nobles[:, :5], axis=1)
        pn0 = R_PNOBLES + num_nobles * player
        player_rows = state[pn0:pn0 + num_nobles]
        new_player_rows = jnp.where(earned[:, None],
                                    nobles.astype(jnp.int8), player_rows)
        new_bank_rows = jnp.where(earned[:, None], jnp.int8(0),
                                  state[R_NOBLES:R_NOBLES + num_nobles])
        state = jax.lax.dynamic_update_slice(
            state, new_player_rows, (pn0, 0))
        state = jax.lax.dynamic_update_slice(
            state, new_bank_rows, (R_NOBLES, 0))
        return state

    def buy_card(state, cost_row, gain_row, player):
        """Pay for a card: colored gems first (after card discounts), gold
        for the rest (reference _buy_card, :344-357)."""
        s = _i32(state)
        cost = cost_row.astype(jnp.int32)[:5]
        gems = pgems(s, player)[:5]
        cards = pcards(s, player)[:5]
        missing = jnp.sum(jnp.maximum(cost - gems - cards, 0))
        paid = jnp.minimum(jnp.maximum(cost - cards, 0), gems)

        state = state.at[R_PGEMS + player, :5].add((-paid).astype(jnp.int8))
        state = state.at[R_BANK, :5].add(paid.astype(jnp.int8))
        state = state.at[R_PGEMS + player, IDX_GOLD].add(
            (-missing).astype(jnp.int8))
        state = state.at[R_BANK, IDX_GOLD].add(missing.astype(jnp.int8))
        state = state.at[R_PCARDS + player].add(gain_row)
        return give_nobles_if_earned(state, player)

    # ---------------- valid moves ----------------

    def valids(state):
        s = _i32(state)
        p = 0  # canonical: player 0 to move
        gems = pgems(s, p)[:5]
        gold = pgems(s, p)[IDX_GOLD]
        cards = pcards(s, p)[:5]
        gems_total = jnp.sum(pgems(s, p)[:6])
        bank = bank_of(s)[:5]

        # buy visible (12) — _valid_buy (:359-368)
        costs = s[R_CARDS:R_CARDS + 24:2, :5]                  # (12,5)
        missing = jnp.sum(jnp.maximum(costs - gems - cards, 0), axis=1)
        v_buy = (missing <= gold) & (jnp.sum(costs, axis=1) != 0)

        # reserve (15) — _valid_reserve (:375-380)
        deck_counts = jnp.sum(s[R_DECK:R_DECK + 6:2, :5], axis=1)  # (3,)
        not_empty = jnp.concatenate(
            [jnp.sum(costs, axis=1) != 0, deck_counts != 0])
        third_slot_free = jnp.sum(
            s[R_PRESERVED + 6 * p + 5, :5]) == 0
        v_reserve = not_empty & third_slot_free

        # buy reserved (3) — _valid_buy_reserve (:402-412)
        rcosts = s[R_PRESERVED + 6 * p:R_PRESERVED + 6 * p + 6:2, :5]
        rmissing = jnp.sum(jnp.maximum(rcosts - gems - cards, 0), axis=1)
        v_buyres = (rmissing <= gold) & (jnp.sum(rcosts, axis=1) != 0)

        # take gems (25 + 5) — (:422-434)
        v_take = (jnp.all(bank[None] - gems3 >= 0, axis=1)
                  & (gems_total + jnp.sum(gems3, axis=1) <= 10))
        v_take2 = (bank >= 4) & (gems_total + 2 <= 10)

        # give gems (15 + 5) — (:446-453)
        v_give = jnp.all(gems[None] - gems2 >= 0, axis=1)
        v_give2 = gems >= 2

        return jnp.concatenate([
            v_buy, v_reserve, v_buyres, v_take, v_take2, v_give, v_give2,
            jnp.ones((1,), bool)])                              # pass

    # ---------------- moves ----------------

    def step(state, action, key, seed):
        p = 0
        action = jnp.asarray(action, jnp.int32)
        seed = jnp.asarray(seed, jnp.int32)

        def do_buy(st):
            i = action                                          # 0..11
            tier, index = i // 4, i % 4
            cards24 = _i32(st)[R_CARDS:R_CARDS + 24]            # (24,7)
            cost = pick_row(cards24, iota24 == 2 * i).astype(jnp.int8)
            gain = pick_row(cards24, iota24 == 2 * i + 1).astype(jnp.int8)
            st = buy_card(st, cost, gain, p)
            return fill_new_card(st, tier, index, key, seed)

        def do_reserve(st):
            i = action - 12                                     # 0..14
            # first empty reserve slot (cost-line sum == 0)
            res = _i32(st)[R_PRESERVED:R_PRESERVED + 6:2, :5]
            empty = jnp.sum(res, axis=1) == 0
            slot = jnp.argmax(empty).astype(jnp.int32)          # 0..2

            is_visible = i < 12
            tier_v, index_v = i // 4, i % 4
            tier_d = i - 12

            # visible branch: move card rows (masked pick), then refill
            cards24 = _i32(st)[R_CARDS:R_CARDS + 24]
            vis_card = jnp.stack([
                pick_row(cards24, iota24 == 2 * i),
                pick_row(cards24, iota24 == 2 * i + 1)]).astype(jnp.int8)
            res_block = st[R_PRESERVED:R_PRESERVED + 6]
            st_vis = st.at[R_PRESERVED:R_PRESERVED + 6].set(
                put_card(res_block, slot, vis_card))
            st_vis = fill_new_card(st_vis, tier_v, index_v, key, seed)
            # deck branch: draw directly into the reserve slot (tier_d < 0
            # on the dead visible side just draws nothing)
            st_deck, card, _ = draw_deck_card(st, tier_d, key, seed)
            st_deck = st_deck.at[R_PRESERVED:R_PRESERVED + 6].set(
                put_card(st_deck[R_PRESERVED:R_PRESERVED + 6], slot, card))
            st = jnp.where(is_visible, st_vis, st_deck)

            # gold gem if available and player holds <= 9 gems (:398-400)
            gets_gold = ((_i32(st)[R_BANK, IDX_GOLD] > 0)
                         & (jnp.sum(_i32(st)[R_PGEMS + p]) <= 9))
            inc = jnp.where(gets_gold, 1, 0).astype(jnp.int8)
            st = st.at[R_PGEMS + p, IDX_GOLD].add(inc)
            st = st.at[R_BANK, IDX_GOLD].add(-inc)
            return st

        def do_buy_reserve(st):
            i = action - 27                                     # 0..2
            base = R_PRESERVED + 6 * p                          # static, p=0
            res6 = _i32(st)[base:base + 6]                      # (6,7)
            cost = pick_row(res6, iota6 == 2 * i).astype(jnp.int8)
            gain = pick_row(res6, iota6 == 2 * i + 1).astype(jnp.int8)
            st = buy_card(st, cost, gain, p)
            # shift remaining reserved cards left (:417-420): rows >= 2i
            # take the row two below (a STATIC shift), zeros past the end
            res = st[base:base + 6]
            down2 = jnp.concatenate([res[2:], jnp.zeros((2, 7), jnp.int8)])
            res = jnp.where((iota6 >= 2 * i)[:, None], down2, res)
            return st.at[base:base + 6].set(res)

        def do_take_gems(st):
            i = action - 30                                     # 0..29
            g3 = jnp.sum(jnp.where((jnp.arange(25) == i)[:, None], gems3, 0),
                         axis=0)
            g = jnp.where(i < 25, g3,
                          2 * (jnp.arange(5) == (i - 25)).astype(jnp.int32))
            st = st.at[R_BANK, :5].add((-g).astype(jnp.int8))
            st = st.at[R_PGEMS + p, :5].add(g.astype(jnp.int8))
            return st

        def do_give_gems(st):
            i = action - 60                                     # 0..19
            g2 = jnp.sum(jnp.where((jnp.arange(15) == i)[:, None], gems2, 0),
                         axis=0)
            g = jnp.where(i < 15, g2,
                          2 * (jnp.arange(5) == (i - 15)).astype(jnp.int32))
            st = st.at[R_BANK, :5].add(g.astype(jnp.int8))
            st = st.at[R_PGEMS + p, :5].add((-g).astype(jnp.int8))
            return st

        branch = jnp.where(action < 12, 0,
                  jnp.where(action < 27, 1,
                   jnp.where(action < 30, 2,
                    jnp.where(action < 60, 3,
                     jnp.where(action < 80, 4, 5)))))
        nxt = jax.lax.switch(branch, [do_buy, do_reserve, do_buy_reserve,
                                      do_take_gems, do_give_gems,
                                      lambda st: st], state)
        # round counter (:203)
        nxt = nxt.at[R_BANK, IDX_POINTS].add(1)
        return nxt, jnp.int32(1)

    # ---------------- swap / terminal / misc ----------------

    def canonical(state, swap):
        k = swap % n

        def roll_block(st, r0, rows_per_player, total_rows):
            # select among the n STATIC rolls of the block — never a
            # traced-shift roll (per-lane gather under vmap)
            block = st[r0:r0 + total_rows]
            rolled = block
            for kk in range(1, n):
                rolled = jnp.where(
                    k == kk,
                    jnp.roll(block, -kk * rows_per_player, axis=0), rolled)
            return st.at[r0:r0 + total_rows].set(rolled)

        st = state
        st = roll_block(st, R_PGEMS, 1, n)
        st = roll_block(st, R_PNOBLES, num_nobles, n * num_nobles)
        st = roll_block(st, R_PCARDS, 1, n)
        st = roll_block(st, R_PRESERVED, 6, 6 * n)
        return st

    def get_round(state):
        return (state[R_BANK, IDX_POINTS].astype(jnp.int32)) & 0xFF

    def get_score(state, player):
        s = _i32(state)
        noble_pts = s[R_PNOBLES:R_PNOBLES + n * num_nobles, IDX_POINTS]
        sel = (jnp.arange(n * num_nobles) // num_nobles) == player
        card_pts = s[R_PCARDS:R_PCARDS + n, IDX_POINTS]
        return (jnp.sum(jnp.where(jnp.arange(n) == player, card_pts, 0))
                + jnp.sum(jnp.where(sel, noble_pts, 0))).astype(jnp.float32)

    def terminal(state):
        """(reference check_end_game, :221-240)"""
        s = _i32(state)
        rnd = get_round(state)
        at_round_start = (rnd % n) == 0
        scores = jnp.stack([get_score(state, p) for p in range(n)])
        ended = at_round_start & ((jnp.max(scores) >= score_win)
                                  | (rnd >= max_moves))
        won = scores == jnp.max(scores)
        several = jnp.sum(won) > 1
        # tie-break: penalize by card count (:233-238)
        nb_cards = jnp.stack(
            [jnp.sum(pcards(s, p)[:5]) for p in range(n)]).astype(jnp.float32)
        scores2 = jnp.where(several, scores - nb_cards / 100.0, scores)
        won2 = scores2 == jnp.max(scores2)
        several2 = jnp.sum(won2) > 1
        result = jnp.where(won2, jnp.where(several2, 0.01, 1.0), -1.0)
        return jnp.where(ended, result, 0.0).astype(jnp.float32)

    # ---------------- init ----------------

    def init(key):
        state = jnp.zeros((num_rows, 7), jnp.int8)
        state = state.at[R_BANK, :5].set(gems_in_play)
        state = state.at[R_BANK, IDX_GOLD].set(5)
        # decks (reference init_game, :156-175)
        for tier in range(3):
            sz = int(DECK_SIZES[tier])
            state = state.at[R_DECK + 2 * tier, :5].set(sz)
            full = int(np.sum(1 << _BIT_SHIFTS[:sz]))
            state = state.at[R_DECK + 2 * tier + 1, :5].set(
                np.int8(full - 256 if full > 127 else full))
        # visible cards: draw 12 (true random via key)
        for tier in range(3):
            for index in range(4):
                key, k = jax.random.split(key)
                state = fill_new_card(state, tier, index, k, jnp.int32(0))
        # nobles: random distinct
        key, k = jax.random.split(key)
        picks = jax.random.choice(k, 10, (num_nobles,), replace=False)
        state = jax.lax.dynamic_update_slice(
            state, nobles_tbl[picks], (R_NOBLES, 0))
        return state

    def observe(state):
        return state.astype(jnp.float32)

    # ---------------- symmetries ----------------
    # fixed count: identity + 9 tier permutations + 2*n reserve permutations
    # (invalid reserve perms fall back to identity — reference emits a
    # variable-length list, SplendorLogicNumba.py:255-301)

    card_perm_tables = []
    for tier in range(3):
        for perm in np.asarray(CARD_PERMS):
            rowp = np.arange(num_rows)
            actp = np.arange(NUM_ACTIONS)
            for i, pp in enumerate(perm):
                rowp[R_CARDS + 8 * tier + 2 * i] = R_CARDS + 8 * tier + 2 * pp
                rowp[R_CARDS + 8 * tier + 2 * i + 1] = (R_CARDS + 8 * tier
                                                        + 2 * pp + 1)
                actp[4 * tier + i] = 4 * tier + pp
                actp[12 + 4 * tier + i] = 12 + 4 * tier + pp
            card_perm_tables.append((rowp, actp))

    n_sym = 1 + len(card_perm_tables) + 2 * n
    sym_rows = jnp.asarray(
        np.stack([np.arange(num_rows)]
                 + [r for r, _ in card_perm_tables]
                 + [np.arange(num_rows)] * (2 * n)))
    sym_acts = jnp.asarray(
        np.stack([np.arange(NUM_ACTIONS)]
                 + [a for _, a in card_perm_tables]
                 + [np.arange(NUM_ACTIONS)] * (2 * n)))
    reserve_perms = jnp.asarray(np.asarray(RESERVE_PERMS))   # (4,2,3)

    def symmetries(state, pi, valid):
        base_states = state[sym_rows]                        # (S,rows,7)
        base_pis = pi[sym_acts]
        base_vas = valid[sym_acts]

        # reserve permutations, dynamic on each player's reserve count
        out_states, out_pis, out_vas = [], [], []
        s32 = _i32(state)
        for player in range(n):
            base = R_PRESERVED + 6 * player
            res_counts = jnp.sum(
                s32[base:base + 6:2, :5], axis=1)
            nb = jnp.sum((res_counts != 0).astype(jnp.int32))
            for j in range(2):
                perm = reserve_perms[nb, j]                  # (3,) or -1s
                ok = perm[0] >= 0
                perm_safe = jnp.where(ok, perm, jnp.arange(3, dtype=perm.dtype))
                rowp = jnp.arange(num_rows)
                for i in range(3):
                    rowp = rowp.at[base + 2 * i].set(
                        base + 2 * perm_safe[i])
                    rowp = rowp.at[base + 2 * i + 1].set(
                        base + 2 * perm_safe[i] + 1)
                st = state[rowp]
                if player == 0:
                    actp = jnp.arange(NUM_ACTIONS)
                    for i in range(3):
                        actp = actp.at[27 + i].set(27 + perm_safe[i])
                    out_pis.append(pi[actp])
                    out_vas.append(valid[actp])
                else:
                    out_pis.append(pi)
                    out_vas.append(valid)
                out_states.append(st)

        states = jnp.concatenate([base_states, jnp.stack(out_states)])
        pis = jnp.concatenate([base_pis, jnp.stack(out_pis)])
        vas = jnp.concatenate([base_vas, jnp.stack(out_vas)])
        return states, pis, vas

    return GameSpec(
        name=f"splendor_{n}p",
        num_players=n,
        state_shape=(num_rows, 7),
        obs_shape=(num_rows, 7),
        num_actions=NUM_ACTIONS,
        max_game_length=max_moves + 2,
        # long scans of this engine fault the TPU worker, and the threshold
        # SHRINKS with batch/sims/net size: 32 moves was safe at the bisect
        # config (B=256, sims=24, 32x2 net) but faults at the production
        # config: at B=2048/128x6 the measured safe chunk is 8 moves at
        # sims=100 and only 1 at sims=200 (docs/tpu_limits.md).  The Coach
        # auto-chunks to 8 for runs at <=safe_scan_sims sims and clamps to
        # 1 beyond that; --scan-moves overrides in either direction.
        safe_scan_moves=8,
        safe_scan_sims=100,
        init=init,
        valids=valids,
        step=step,
        canonical=canonical,
        terminal=terminal,
        observe=observe,
        get_round=get_round,
        get_score=get_score,
        symmetries=symmetries,
        num_symmetries=n_sym,
        meta=SplendorMeta(num_players=n, num_nobles=num_nobles,
                          gems_in_play=gems_in_play, max_moves=max_moves),
    )
