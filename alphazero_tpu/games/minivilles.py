"""Minivilles (Machi Koro) — TPU-native vectorized engine.

Behavioral reference: /root/reference/minivilles/MinivillesLogicNumba.py
(394 LoC).  Dice-driven economy game with play-again turns (amusement-park
doubles, radio-tower rerolls) and a one-step state history kept in the second
state column.

Reference quirks preserved exactly:
- dice are np.random.randint(1, 6) => uniform 1..5 (upper bound exclusive)
- the "random" tie-breaks in business-center/TV-channel use
  searchsorted(cumsum(bool_mask), random()) on an UN-normalized mask, which
  always resolves to the FIRST maximal index — i.e. they are deterministic
- make_move ignores random_seed (no universes path in the reference); here
  seed semantics are: 0 => PRNG-key dice; 1..25 => exact dice encoding
  (d1=(seed-1)%5+1, d2=(seed-1)//5+1, used by parity tests); >25 => a
  deterministic hash of (seed, round, roller money) so search universes work.

State ((18+20n), 2) int8; column 0 = current, column 1 = previous state
(history used by the radio-tower reroll and fed to the NN).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from alphazero_tpu.games.base import GameSpec

NUM_ACTIONS = 21
# card/monument identifiers and costs (reference lines 370-395)
(CHAMPS, FERME, BOULANGERIE, CAFE, SUPERETTE, FORET, STADE, AFFAIRES,
 CHAINE, FROMAGERIE, MEUBLES, MINE, RESTAURANT, VERGER, MARCHE) = range(15)
GARE, CENTRECOM, RADIO, PARC = range(4)
CARDS_COST = np.array([1, 1, 1, 2, 2, 3, 6, 8, 7, 5, 3, 6, 3, 3, 2], np.int32)
MONUMENTS_COST = np.array([4, 10, 16, 22], np.int32)


def deterministic_dice(seed, rnd, money):
    """Universe-style deterministic dice for seed > 25 (our addition; the
    reference rolls true-random during search).  Multipliers chosen so the
    products stay int32-exact (magic seeds <= 31416; x64 is off on TPU)."""
    h1 = (seed * 48271 + rnd * 97 + money * 31) & 0x7FFFFFFF
    h2 = (seed * 40503 + rnd * 13 + money * 7) & 0x7FFFFFFF
    return h1 % 5 + 1, h2 % 5 + 1


@dataclasses.dataclass(frozen=True)
class MinivillesMeta:
    num_players: int


def make_minivilles(num_players: int = 2) -> GameSpec:
    if num_players not in (2, 3, 4):
        raise ValueError("Minivilles supports 2-4 players")
    n = num_players
    rows = 18 + 20 * n
    R_ROUND, R_DICE, R_PSTATE, R_MARKET = 0, 1, 2, 3
    R_MONEY = 18
    R_CARDS = 18 + n
    R_MONU = 18 + 16 * n
    cards_cost = jnp.asarray(CARDS_COST)
    monu_cost = jnp.asarray(MONUMENTS_COST)

    def _i32(s):
        return s.astype(jnp.int32)

    def card(s, p, c):
        return s[R_CARDS + 15 * p + c, 0]

    def monu(s, p, m):
        return s[R_MONU + 4 * p + m, 0]

    def money(s, p):
        return s[R_MONEY + p, 0]

    def add_money(state, p, amt):
        """Clamped money update (reference _add_money, :352-358)."""
        new = jnp.clip(_i32(state)[R_MONEY + p, 0] + amt, 0, 127)
        return state.at[R_MONEY + p, 0].set(new.astype(jnp.int8))

    def get_score_i(s, p):
        m = jax.lax.dynamic_slice(
        s, (jnp.asarray(R_MONU + 4 * p, jnp.int32), jnp.int32(0)), (4, 1))[:, 0]
        return jnp.sum(m * monu_cost)

    def get_wealth(s, p):
        return jnp.minimum(get_score_i(s, p) + money(s, p), 127)

    # ---------------- dice effects (reference _dice_effect, :244-350) ------

    def first_argmax(x):
        return jnp.argmax(x).astype(jnp.int32)

    def dice_effect(state, result, roller):
        """roller: traced 0..n-1 in the canonical frame."""

        def all_receive(state, c, amt):
            for p in range(n):
                s = _i32(state)
                state = add_money(state, p, amt * card(s, p, c))
            return state

        def cur_receive(state, c, amt, mall=False):
            for p in range(n):
                s = _i32(state)
                bonus = jnp.where(mall & (monu(s, p, CENTRECOM) > 0), 1, 0) \
                    if mall else 0
                gain = (amt + bonus) * card(s, p, c)
                state = jnp.where(roller == p,
                                  add_money(state, p, gain), state)
            return state

        def cur_receive_dyn(state, c, amt_fn, mall=False):
            """amt per-roller (for fromagerie/meubles/marche multipliers)."""
            for p in range(n):
                s = _i32(state)
                bonus = jnp.where(mall & (monu(s, p, CENTRECOM) > 0), 1, 0) \
                    if mall else 0
                gain = (amt_fn(s, p) + bonus) * card(s, p, c)
                state = jnp.where(roller == p,
                                  add_money(state, p, gain), state)
            return state

        def cur_give(state, c, amt, mall=True):
            """Card holders PAY the roller (the reference's _current_give is
            inverted vs the physical game's red cards: the opponent pays
            amount = cards*value capped by the ROLLER's money, clamped at 0
            on the payer — money is not conserved; reference :258-266).
            Order: roller+n-1 down to roller+1, sequential."""
            for k in range(n - 1, 0, -1):
                s = _i32(state)
                p = (roller + k) % n
                # gather opponent card count / mall at traced p
                cards_p = jnp.stack([card(s, q, c) for q in range(n)])[p]
                mall_p = jnp.stack([monu(s, q, CENTRECOM)
                                    for q in range(n)])[p] > 0
                bonus = jnp.where(mall & mall_p, 1, 0)
                roller_money = jnp.stack(
                    [money(s, q) for q in range(n)])[roller]
                amount = jnp.minimum((amt + bonus) * cards_p, roller_money)
                for q in range(n):
                    state = jnp.where(p == q,
                                      add_money(state, q, -amount), state)
                    state = jnp.where(roller == q,
                                      add_money(state, q, amount), state)
            return state

        def stadium(state):
            """Each opponent gives 2 (reference :268-277, ascending order)."""
            for p in range(n):
                s = _i32(state)
                amount = jnp.minimum(money(s, p), 2)
                amount = jnp.where(p == roller, 0, amount)
                state = add_money(state, p, -amount)
                for q in range(n):
                    state = jnp.where(roller == q,
                                      add_money(state, q, amount), state)
            return state

        def business_center(state):
            """Swap roller's cheapest building with richest opponent's most
            expensive (reference :279-300; tie-breaks are first-index)."""
            s = _i32(state)
            wealths = jnp.stack([get_wealth(s, p) for p in range(n)])
            wealths = wealths.at[roller].set(0)
            target = first_argmax(wealths == jnp.max(wealths))
            tcards = jax.lax.dynamic_slice(
                s, (R_CARDS + 15 * target, jnp.int32(0)), (15, 1))[:, 0]
            tcost = jnp.minimum(tcards, 1) * cards_cost
            tcost = tcost.at[STADE].set(0).at[AFFAIRES].set(0) \
                         .at[CHAINE].set(0)
            tbuild = first_argmax(tcost == jnp.max(tcost))
            mcards = jax.lax.dynamic_slice(
                s, (R_CARDS + 15 * roller, jnp.int32(0)), (15, 1))[:, 0]
            mcost = jnp.minimum(mcards, 1) * cards_cost
            mcost = jnp.where(mcost == 0, 99, mcost)
            mbuild = first_argmax(mcost == jnp.min(mcost))
            state = state.at[R_CARDS + 15 * target + tbuild, 0].add(-1)
            state = state.at[R_CARDS + 15 * roller + tbuild, 0].add(1)
            state = state.at[R_CARDS + 15 * roller + mbuild, 0].add(-1)
            state = state.at[R_CARDS + 15 * target + mbuild, 0].add(1)
            return state

        def tv_channel(state):
            """Take up to 5 from the richest holder (reference :302-316)."""
            s = _i32(state)
            moneys = jnp.stack([money(s, p) for p in range(n)])
            moneys = moneys.at[roller].set(0)
            mmax = jnp.minimum(jnp.max(moneys), 5)
            who = (moneys == mmax) | (moneys >= 5)
            wealths = jnp.stack([get_wealth(s, p) for p in range(n)])
            wealths = jnp.where(who, wealths, 0)
            target = first_argmax(wealths == jnp.max(wealths))
            amount = jnp.minimum(moneys[target], 5)
            state = add_money(state, target, -amount)
            for q in range(n):
                state = jnp.where(roller == q,
                                  add_money(state, q, amount), state)
            return state

        def cow(s, p):
            return 3 * card(s, p, FERME)

        def gear(s, p):
            return 3 * (card(s, p, FORET) + card(s, p, MINE))

        def wheat(s, p):
            return 2 * (card(s, p, CHAMPS) + card(s, p, VERGER))

        def r1(st): return all_receive(st, CHAMPS, 1)

        def r2(st):
            return cur_receive(all_receive(st, FERME, 1), BOULANGERIE, 1,
                               mall=True)

        def r3(st):
            return cur_receive(cur_give(st, CAFE, 1), BOULANGERIE, 1,
                               mall=True)

        def r4(st): return cur_receive(st, SUPERETTE, 3, mall=True)

        def r5(st): return all_receive(st, FORET, 1)

        def r6(st):
            s = _i32(st)
            has = jnp.stack([jnp.stack([card(s, q, c) for q in range(n)])
                             for c in (STADE, AFFAIRES, CHAINE)])
            st = jnp.where(has[0][roller] > 0, stadium(st), st)
            st = jnp.where(has[1][roller] > 0, business_center(st), st)
            st = jnp.where(has[2][roller] > 0, tv_channel(st), st)
            return st

        def r7(st): return cur_receive_dyn(st, FROMAGERIE, cow)

        def r8(st): return cur_receive_dyn(st, MEUBLES, gear)

        def r9(st): return all_receive(cur_give(st, RESTAURANT, 2), MINE, 5)

        def r10(st):
            return all_receive(cur_give(st, RESTAURANT, 2), VERGER, 3)

        def r11(st): return cur_receive_dyn(st, MARCHE, wheat)

        return jax.lax.switch(jnp.clip(result - 1, 0, 11),
                              [r1, r2, r3, r4, r5, r6, r7, r8, r9, r10,
                               r11, r11], state)

    # ---------------- dice roll ----------------

    def roll_dice(state, roller, key, seed):
        """Reference _roll_dice (:232-242): 1..5 each die; two dice with the
        train station; returns (dice_sum, identical)."""
        s = _i32(state)
        two = jnp.stack([monu(s, p, GARE) for p in range(n)])[roller] > 0
        k1, k2 = jax.random.split(key)
        rnd = s[R_ROUND, 0]
        mny = jnp.stack([money(s, p) for p in range(n)])[roller]
        hd1, hd2 = deterministic_dice(seed, rnd, mny)
        exact1, exact2 = (seed - 1) % 5 + 1, (seed - 1) // 5 % 5 + 1
        d1 = jnp.where(seed == 0, jax.random.randint(k1, (), 1, 6),
                       jnp.where(seed <= 25, exact1, hd1)).astype(jnp.int32)
        d2 = jnp.where(seed == 0, jax.random.randint(k2, (), 1, 6),
                       jnp.where(seed <= 25, exact2, hd2)).astype(jnp.int32)
        identical = two & (d1 == d2)
        total = jnp.where(two, d1 + d2, d1)
        return total, identical

    # ---------------- GameSpec functions ----------------

    def valids(state):
        s = _i32(state)
        p = 0
        my_cards = s[R_CARDS:R_CARDS + 15, 0]
        my_monu = s[R_MONU:R_MONU + 4, 0]
        mny = money(s, p)
        v_cards = (mny >= cards_cost) & (s[R_MARKET:R_MARKET + 15, 0] > 0)
        for c in (STADE, AFFAIRES, CHAINE):   # one purple of each per player
            v_cards = v_cards.at[c].set(v_cards[c] & (my_cards[c] == 0))
        v_monu = (mny >= monu_cost) & (my_monu == 0)
        # NB: the reference checks monument index 3 for the reroll ability
        # (its comment says radio tower, its code says players_monuments[4p+3],
        # MinivillesLogicNumba.py:213-215) — follow the code.
        v_again = (my_monu[3] > 0) & (s[R_PSTATE, 0] % 2 == 0)
        return jnp.concatenate([v_cards, v_monu, v_again[None],
                                jnp.ones(1, bool)])

    def step(state, action, key, seed):
        action = jnp.asarray(action, jnp.int32)
        seed = jnp.asarray(seed, jnp.int32)
        p = 0
        s = _i32(state)

        # --- apply the action ---
        def buy_card(st):
            c = action
            st = add_money(st, p, -cards_cost[jnp.minimum(c, 14)])
            st = st.at[R_MARKET + c, 0].add(-1)
            st = st.at[R_CARDS + 15 * p + c, 0].add(1)
            return st

        def buy_monu(st):
            m = action - 15
            st = add_money(st, p, -monu_cost[jnp.minimum(m, 3)])
            st = st.at[R_MONU + 4 * p + m, 0].add(1)
            return st

        def dice_again(st):
            # restore current column from history (reference :226-230)
            col1 = st[:, 1]
            keep = jnp.zeros(rows, bool)
            keep = keep.at[R_MARKET:].set(True).at[R_ROUND].set(True)
            new0 = jnp.where(keep, col1, st[:, 0])
            return jnp.stack([new0, col1], axis=-1)

        branch = jnp.where(action < 15, 0,
                  jnp.where(action < 19, 1,
                   jnp.where(action == 19, 2, 3)))
        state = jax.lax.switch(branch, [buy_card, buy_monu, dice_again,
                                        lambda st: st], state)

        # --- next player & round (reference :125-133) ---
        is_reroll = action == 19
        played_again = _i32(state)[R_PSTATE, 0] >= 2
        nxt = jnp.where(is_reroll | played_again, 0, 1).astype(jnp.int32)
        inc_round = ~is_reroll
        state = state.at[R_ROUND, 0].add(
            jnp.where(inc_round, 1, 0).astype(jnp.int8))

        # --- history copy (unless reroll, reference :136-139) ---
        copy = jnp.zeros(rows, bool).at[R_MARKET:].set(True) \
                                    .at[R_ROUND].set(True)
        col1 = jnp.where(copy & ~is_reroll, state[:, 0], state[:, 1])
        state = jnp.stack([state[:, 0], col1], axis=-1)

        # --- roll dice for next player (relative index nxt) ---
        dice, identical = roll_dice(state, nxt % n, key, seed)
        state = state.at[R_DICE, 0].set(dice.astype(jnp.int8))
        state = dice_effect(state, dice, nxt % n)
        pstate = (jnp.where(is_reroll, 1, 0)
                  + jnp.where(identical, 2, 0)).astype(jnp.int8)
        state = state.at[R_PSTATE, 0].set(pstate)
        return state, nxt

    def canonical(state, swap):
        k = swap % n

        def roll_block(st, r0, per, total):
            block = jax.lax.dynamic_slice(st, (r0, 0), (total, 2))
            rolled = jnp.roll(block, -k * per, axis=0)
            return jax.lax.dynamic_update_slice(st, rolled, (r0, 0))

        st = state
        st = roll_block(st, R_MONEY, 1, n)
        st = roll_block(st, R_CARDS, 15, 15 * n)
        st = roll_block(st, R_MONU, 4, 4 * n)
        return jnp.where(k == 0, state, st)

    def terminal(state):
        """(reference check_end_game, :168-175)"""
        s = _i32(state)
        scores = jnp.stack([get_score_i(s, p) for p in range(n)])
        smax = jnp.max(scores)
        moneys = jnp.stack([money(s, p) for p in range(n)])
        ended = ((smax >= int(MONUMENTS_COST.sum()))
                 | (s[R_ROUND, 0] >= 126) | jnp.any(moneys >= 126))
        single = jnp.sum(scores == smax) == 1
        res = jnp.where(scores == smax, jnp.where(single, 1.0, 0.01), -1.0)
        return jnp.where(ended, res, 0.0).astype(jnp.float32)

    def get_score(state, player):
        return get_score_i(_i32(state), player).astype(jnp.float32)

    def get_round(state):
        return state[R_ROUND, 0].astype(jnp.int32)

    def init(key):
        state = jnp.zeros((rows, 2), jnp.int8)
        state = state.at[R_MARKET:R_MARKET + 15].set(6)
        state = state.at[R_MARKET + 6:R_MARKET + 9].set(4)  # purple cards
        state = state.at[R_MONEY:R_MONEY + n].set(3)
        for p in range(n):
            # starting cards: types 0 and 1 (reference init_game, :90-92)
            state = state.at[R_CARDS + 15 * p + CHAMPS].set(1)
            state = state.at[R_CARDS + 15 * p + FERME].set(1)
        # first dice roll for player 0 (reference init_game, :96-99)
        dice, _ = roll_dice(state, jnp.int32(0), key, jnp.int32(0))
        state = state.at[R_DICE, 0].set(dice.astype(jnp.int8))
        state = dice_effect(state, dice, jnp.int32(0))
        return state

    def observe(state):
        return state.astype(jnp.float32)

    def symmetries(state, pi, valid):
        return state[None], pi[None], valid[None]

    return GameSpec(
        name=f"minivilles_{n}p",
        num_players=n,
        state_shape=(rows, 2),
        obs_shape=(rows, 2),
        num_actions=NUM_ACTIONS,
        max_game_length=260,
        init=init,
        valids=valids,
        step=step,
        canonical=canonical,
        terminal=terminal,
        observe=observe,
        get_round=get_round,
        get_score=get_score,
        symmetries=symmetries,
        num_symmetries=1,
        meta=MinivillesMeta(num_players=n),
    )
