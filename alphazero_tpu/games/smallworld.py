"""Small World — TPU-native vectorized engine.

Behavioral reference: /root/reference/smallworld/SmallworldLogicNumba.py
(1510 LoC) + SmallworldConstants.py + per-player-count maps.  The reference's
hardest engine: a 9-phase turn state machine (PHASE_READY..PHASE_WAIT) over
multi-action turns, 14 peoples x 20 special powers, declined peoples,
dice-assisted conquests, and a 6-combo people deck.

From-scratch functional JAX implementation.  Every per-area Python loop is a
vector expression over the (A,) area axis; the phase machine becomes
where-merged candidate states (states are tiny: (A+5n+7, 8) int8).  Call
sites pass the *static* next-phase constant, so each `_prepare` caller
compiles only its own transition logic (mirroring
_prepare_for_new_status, reference :1070-1105).

State: (NB_AREAS + 5n + DECK_SIZE + 1, 8) int8, reference layout (:9-73):
  rows 0..A-1   territories (nb, type, power, def_ppl, def_pwr, total_def,
                points, owner); declined types/powers are negative
  rows A..A+3n  peoples[(player, ppl_id in {DECLINED_SPIRIT, DECLINED,
                ACTIVE})] hands
  next 6        visible deck combos (nb, people, power, _,_,_, coins, -1)
  next n        round_status (on-board count, .., NETWDT, phase, defense,
                score preview, player)
  next n        game_status (.., round, current-ppl-id, _, score-128, player)
  last          invisible deck: people/power bitfields + dice/deck counters

Actions (5A + 8 + 6 + 2, reference :75-98): abandon/attack/special-people/
special-power per area, redeploy (skip, 1..7-per-area, one-on-area),
choose deck combo, decline, end turn.

Chance: conquest dice and deck draws.  seed != 0 reproduces the reference
LCGs bit-exactly — dice rnd = (1981*(seed+cnt)+5) % 6 over DICE_VALUES
(:424-430), deck rnd = (4594591*(seed+cnt)) % len (:1372-1381) computed in
modular int32 arithmetic; seed == 0 uses the PRNG key.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from alphazero_tpu.games.base import GameSpec
from alphazero_tpu.games.smallworld_maps import (
    load_map, FORESTT, FARMLAND, HILLT, SWAMPT, MOUNTAIN, WATER,
    CAVERN, MAGIC, MINE)

# game constants (SmallworldConstants.py)
DICE_VALUES = np.array([0, 0, 0, 1, 2, 3], np.int32)
MAX_DICE = 3
DECK_SIZE = 6
SCORE_INIT, SCORE_OFFSET = 5, 128
IMMUNITY = 20
MAX_REDEPLOY = 8
DECLINED_SPIRIT, DECLINED, ACTIVE = 0, 1, 2
(P_READY, P_CHOOSE, P_ABANDON, P_CONQUEST, P_CONQ_DICE, P_AB_AMAZONS,
 P_REDEPLOY, P_STOUT_DECL, P_WAIT) = range(1, 10)
(NOPPL, AMAZON, DWARF, ELF, GHOUL, GIANT, HALFLING, HUMAN, ORC, RATMAN,
 SKELETON, SORCERER, TRITON, TROLL, WIZARD) = range(15)
LOST_TRIBE = -15
MAX_SKELETONS, MAX_SORCERERS = 20, 18
INITIAL_NB_PPL = np.array([0, 6, 3, 6, 5, 6, 6, 5, 5, 8, 6, 5, 6, 5, 5, 1],
                          np.int32)
INITIAL_TOKENS = np.array([0, 0, 0, 0, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                          np.int32)
(NOPOWER, ALCHEMIST, BERSERK, BIVOUACKING, COMMANDO, DIPLOMAT, DRAGONMASTER,
 FLYING, FOREST, FORTIFIED, HEROIC, HILL, MERCHANT, MOUNTED, PILLAGING,
 SEAFARING, SPIRIT, STOUT, SWAMP, UNDERWORLD, WEALTHY) = range(21)
INITIAL_NB_PWR = np.array([0, 4, 4, 5, 4, 5, 5, 5, 4, 3, 5, 4, 2, 5, 5, 5,
                           5, 4, 4, 5, 4], np.int32)
INITIAL_TOKENS_PWR = np.array([0, 0, 0, 5, 0, 0, 0, 0, 0, 6, 2, 0, 0, 0, 0,
                               0, 0, 0, 0, 0, 7], np.int32)
N_PEOPLE_KINDS = WIZARD + 1          # 15 (incl. NOPPL)
N_POWER_KINDS = WEALTHY + 1          # 21 (incl. NOPOWER)

_BIT_W8 = np.array([128, 64, 32, 16, 8, 4, 2, 1], np.int32)


def _pack_bits(bits, nbytes):
    """my_packbits (reference :110-117): MSB-first int8 bytes."""
    pad = nbytes * 8 - bits.shape[0]
    b = jnp.concatenate([bits.astype(jnp.int32), jnp.zeros(pad, jnp.int32)])
    vals = jnp.sum(b.reshape(nbytes, 8) * _BIT_W8, axis=1)
    return jnp.where(vals > 127, vals - 256, vals)


def _unpack_bits(bytes_i32, nbits):
    u = jnp.where(bytes_i32 < 0, bytes_i32 + 256, bytes_i32)
    bits = (u[:, None] & _BIT_W8) != 0
    return bits.reshape(-1)[:nbits]


@dataclasses.dataclass(frozen=True)
class SmallworldMeta:
    num_players: int
    nb_areas: int
    nb_rounds: int


def make_smallworld(num_players: int = 2) -> GameSpec:
    if num_players not in (2, 3, 4):
        raise ValueError("Small World supports 2-4 players (per-count maps)")
    n = num_players
    descr_np, conn_np, nb_rounds = load_map(n)
    A = descr_np.shape[0]
    num_actions = 5 * A + MAX_REDEPLOY + DECK_SIZE + 2
    n_rows = A + 5 * n + DECK_SIZE + 1

    R_P = A                       # peoples rows: R_P + 3*p + ppl_id
    R_D = A + 3 * n               # visible deck
    R_RS = R_D + DECK_SIZE        # round_status rows
    R_GS = R_RS + n               # game_status rows
    R_ID = R_GS + n               # invisible deck row

    descr = jnp.asarray(descr_np, jnp.int32)
    conn = jnp.asarray(conn_np)
    terrain = descr[:, 0]
    is_mountain = (terrain == MOUNTAIN).astype(jnp.int32)
    at_edge = descr[:, 5] != 0
    border_water = jnp.asarray(conn_np @ (descr_np[:, 0] == WATER) > 0)
    border_mountain = jnp.asarray(conn_np @ (descr_np[:, 0] == MOUNTAIN) > 0)
    dice_values = jnp.asarray(DICE_VALUES)
    init_nb_ppl = jnp.asarray(INITIAL_NB_PPL)
    init_tok = jnp.asarray(INITIAL_TOKENS)
    init_nb_pwr = jnp.asarray(INITIAL_NB_PWR)
    init_tok_pwr = jnp.asarray(INITIAL_TOKENS_PWR)

    def _i32(x):
        return x.astype(jnp.int32)

    def _to_int8(x):
        """Wrap like numpy int8 arithmetic does (the reference's counters,
        e.g. the dice-usage byte, rely on silent int8 wraparound)."""
        return (jnp.mod(x + 128, 256) - 128).astype(jnp.int8)

    # ---------------- small accessors (player 0 = canonical mover) ---------

    def cur_ridx(s):
        return R_P + jnp.maximum(s[R_GS, 4], 0)     # active row when id < 0

    def occ_by(s, ptype):
        return s[:A, 1] == ptype

    def total_ppl(s, ridx):
        cur = s[ridx]
        return jnp.sum(s[:A, 0] * occ_by(s, cur[1])) + cur[0]

    def gather_but_one(s, ridx):
        """reference _gather_current_ppl_but_one (:1059-1067)."""
        occ = occ_by(s, s[ridx][1])
        g = jnp.maximum(s[:A, 0] - 1, 0) * occ
        s = s.at[:A, 0].add(-g).at[:A, 5].add(-g)
        return s.at[ridx, 0].add(jnp.sum(g))

    def owner_of(s, area):
        """reference _ppl_owner_of (:962-968) -> (row idx, player, found)."""
        t = s[area, 1]
        types = s[R_P:R_P + 3 * n, 1]
        eq = types == t
        found = (t != NOPPL) & (t != LOST_TRIBE) & jnp.any(eq)
        flat = jnp.argmax(eq)
        return R_P + flat, flat // 3, found

    def min_attack(s, area, cur):
        """reference _minimum_ppl_for_attack (:982-998)."""
        m = s[area, 5] + 2
        m -= ((cur[1] == TRITON) & border_water[area]).astype(jnp.int32)
        m -= ((cur[1] == GIANT) & border_mountain[area]).astype(jnp.int32)
        m -= (cur[2] == COMMANDO).astype(jnp.int32)
        m -= ((cur[2] == MOUNTED) & ((terrain[area] == HILLT) |
                                     (terrain[area] == FARMLAND))) \
            .astype(jnp.int32)
        m -= ((cur[2] == UNDERWORLD) & (descr[area, CAVERN] != 0)) \
            .astype(jnp.int32)
        return jnp.maximum(m, 1)

    def min_attack_vec(s, cur):
        m = s[:A, 5] + 2
        m -= ((cur[1] == TRITON) & border_water).astype(jnp.int32)
        m -= ((cur[1] == GIANT) & border_mountain).astype(jnp.int32)
        m -= (cur[2] == COMMANDO).astype(jnp.int32)
        m -= ((cur[2] == MOUNTED) & ((terrain == HILLT) |
                                     (terrain == FARMLAND))).astype(jnp.int32)
        m -= ((cur[2] == UNDERWORLD) & (descr[:, CAVERN] != 0)) \
            .astype(jnp.int32)
        return jnp.maximum(m, 1)

    def upd_territory_after(s, ridx, player, area):
        """reference _update_territory_after_win_or_decline (:1442-1476)."""
        cur = s[ridx]
        half = (cur[1] == HALFLING) & (cur[3] > 0)
        s = s.at[area, 3].set(jnp.where(half, IMMUNITY, 0))
        s = s.at[ridx, 3].add(jnp.where(half, -1, 0))
        t = s[area]
        d5 = t[0] + t[3] + t[4] + is_mountain[area] \
            + (jnp.abs(t[1]) == TROLL).astype(jnp.int32)
        s = s.at[area, 5].set(d5)
        d6 = 1 \
            + ((descr[area, MINE] != 0) & (jnp.abs(t[1]) == DWARF)) \
            + ((terrain[area] == FARMLAND) & (t[1] == HUMAN)) \
            + ((descr[area, MAGIC] != 0) & (t[1] == WIZARD)) \
            + ((terrain[area] == FORESTT) & (t[2] == FOREST)) \
            + ((terrain[area] == HILLT) & (t[2] == HILL)) \
            + ((terrain[area] == SWAMPT) & (t[2] == SWAMP)) \
            + (t[2] == MERCHANT) \
            + ((t[4] > 0) & (t[2] == FORTIFIED))
        s = s.at[area, 6].set(d6)
        return s.at[area, 7].set(player)

    def upd_round_status(s, ridx, player):
        """reference _update_round_status (:1478-1510)."""
        cur = s[ridx]
        pts = jnp.sum(s[:A, 6] * occ_by(s, cur[1]))
        bonus = jnp.where(
            cur[1] >= 0,
            (cur[1] == ORC) * s[R_RS + player, 3]
            + (cur[2] == PILLAGING) * s[R_RS + player, 3]
            + (cur[2] == ALCHEMIST) * 2
            + jnp.where((cur[2] == WEALTHY) & (cur[4] > 0), cur[4], 0), 0)
        s = s.at[ridx, 6].set(pts + bonus)
        owned = s[:A, 7] == player
        s = s.at[R_RS + player, 0].set(jnp.sum(s[:A, 0] * owned))
        s = s.at[R_RS + player, 5].set(
            jnp.minimum(jnp.sum(s[:A, 5] * owned), 127))
        prow = R_P + 3 * player
        s = s.at[R_RS + player, 6].set(
            s[prow, 6] + s[prow + 1, 6] + s[prow + 2, 6])
        return s

    def compute_and_update_score(s):
        """reference _compute_and_update_score (:1287-1334), player 0."""
        s = upd_round_status(s, cur_ridx(s), 0)
        types3 = s[R_P:R_P + 3, 1]                       # player 0's peoples
        mine_ = (s[:A, 1] != NOPPL) & \
            ((s[:A, 1] == types3[0]) | (s[:A, 1] == types3[1]) |
             (s[:A, 1] == types3[2]))
        t1, t2, t4 = s[:A, 1], s[:A, 2], s[:A, 4]
        per_area = 1 \
            + ((descr[:, MINE] != 0) & (jnp.abs(t1) == DWARF)) \
            + ((terrain == FARMLAND) & (t1 == HUMAN)) \
            + ((descr[:, MAGIC] != 0) & (t1 == WIZARD)) \
            + ((terrain == FORESTT) & (t2 == FOREST)) \
            + ((terrain == HILLT) & (t2 == HILL)) \
            + ((terrain == SWAMPT) & (t2 == SWAMP)) \
            + (t2 == MERCHANT) \
            + ((t4 > 0) & (t2 == FORTIFIED))
        sft = jnp.sum(per_area * mine_)
        act = s[R_P + ACTIVE]
        sft += (act[1] == ORC) * s[R_RS, 3]
        sft += (act[2] == PILLAGING) * s[R_RS, 3]
        sft += (act[2] == ALCHEMIST) * 2
        wealthy = (act[2] == WEALTHY) & (act[4] > 0)
        sft += jnp.where(wealthy, act[4], 0)
        s = s.at[R_P + ACTIVE, 4].set(jnp.where(wealthy, 0, act[4]))
        return s.at[R_GS, 6].set(jnp.minimum(s[R_GS, 6] + sft, 127))

    def limit_added(s, ridx, addition, maximum):
        return jnp.minimum(addition, maximum - total_ppl(s, ridx))

    def virt_avail(s, ridx, next_status: int):
        """reference _ppl_virtually_available (:1206-1233); static next."""
        cur = s[ridx]
        old = s[R_RS, 4]
        avail = cur[0]
        occ = occ_by(s, cur[1])
        surplus = jnp.sum(jnp.maximum(s[:A, 0] - 1, 0) * occ)
        if next_status in (P_ABANDON, P_CONQUEST, P_CONQ_DICE):
            avail += jnp.where(old == P_READY, surplus, 0)
        elif next_status == P_REDEPLOY:
            in_old = (old == P_READY) | (old == P_ABANDON) | \
                (old == P_CONQUEST) | (old == P_CONQ_DICE) | \
                (old == P_AB_AMAZONS)
            avail += jnp.where(in_old, surplus, 0)
        if next_status == P_REDEPLOY:
            am = (cur[1] == AMAZON) & \
                ((old == P_CONQUEST) | (old == P_CONQ_DICE) |
                 (old == P_AB_AMAZONS)) & (cur[3] != 0)
            avail -= jnp.where(am, cur[3], 0)
            # NB: the reference adds limit(cur[3]//2, ...) here with
            # cur[3] == 0, i.e. min(0, MAX-total) — can be NEGATIVE; kept.
            sk = (cur[1] == SKELETON) & \
                ((old == P_READY) | (old == P_CHOOSE) | (old == P_ABANDON) |
                 (old == P_CONQUEST) | (old == P_CONQ_DICE) |
                 (old == P_AB_AMAZONS)) & (cur[3] == 0)
            avail += jnp.where(
                sk, limit_added(s, ridx, cur[3] // 2, MAX_SKELETONS), 0)
        if next_status == P_CONQUEST:
            am = (cur[1] == AMAZON) & \
                ((old == P_READY) | (old == P_CHOOSE) |
                 (old == P_ABANDON)) & (cur[3] == 0)
            avail += jnp.where(am, 4, 0)
        return avail

    def enough_amazons(s, ridx):
        cur = s[ridx]
        return (cur[1] != AMAZON) | (virt_avail(s, ridx, P_REDEPLOY) >= 0)

    # ---------------- dice & deck chance (LCG parity) ----------------------

    def roll_dice(s, key, seed):
        """One conquest die; increments the usage counter (reference
        :424-431). Returns (s, dice)."""
        cnt = s[R_ID, 5]
        rnd = jnp.mod(1981 * (seed + cnt) + 5, 6)
        k_idx = jax.random.randint(jax.random.fold_in(key, cnt), (), 0, 6)
        dice = jnp.where(seed == 0, dice_values[k_idx], dice_values[rnd])
        return s.at[R_ID, 5].add(1), dice

    def draw_combo(s, key, seed, deck_slot):
        """Draw one people+power combo into visible deck row `deck_slot`
        (reference _update_deck_after_chose/_decline, :1358-1432)."""
        av_ppl = _unpack_bits(s[R_ID, 0:2], 16)[:N_PEOPLE_KINDS]
        av_pwr = _unpack_bits(s[R_ID, 2:5], 24)[:N_POWER_KINDS]
        n_ppl = jnp.sum(av_ppl)
        n_pwr = jnp.maximum(jnp.sum(av_pwr), 1)
        cnt = s[R_ID, 6]
        # (4594591 * x) % m computed as ((4594591 % m) * (x % m)) % m so the
        # product stays int32-exact (m <= 21)

        def pick(avail, count, salt):
            rnd_l = ((4594591 % count) * ((seed + cnt) % count)) % count
            rnd_k = jax.random.randint(
                jax.random.fold_in(key, 2 * cnt + salt), (), 0, count)
            rank = jnp.where(seed == 0, rnd_k, rnd_l)
            csum = jnp.cumsum(avail)
            return jnp.argmax(avail & (csum == rank + 1))

        ppl = pick(av_ppl, jnp.maximum(n_ppl, 1), 0)
        pwr = pick(av_pwr, n_pwr, 1)
        none = n_ppl == 0
        ppl = jnp.where(none, NOPPL, ppl)
        pwr = jnp.where(none, NOPOWER, pwr)
        nb = jnp.where(none, 0, init_nb_ppl[ppl] + init_nb_pwr[pwr])
        row = jnp.array([0, 0, 0, 0, 0, 0, 0, -1], jnp.int32)
        row = row.at[0].set(nb).at[1].set(ppl).at[2].set(pwr)
        s = s.at[R_D + deck_slot].set(row)
        s = s.at[R_ID, 6].add(jnp.where(none, 0, 1))
        av_ppl = av_ppl.at[ppl].set(False)
        av_pwr = av_pwr.at[pwr].set(False)
        s = s.at[R_ID, 0:2].set(_pack_bits(av_ppl, 2))
        return s.at[R_ID, 2:5].set(_pack_bits(av_pwr, 3)), none

    def rebuild_avail_from_play(s):
        """reference _update_deck_after_decline (:1391-1408): all kinds
        minus those in the visible deck or any player's hand."""
        av_ppl = jnp.ones(N_PEOPLE_KINDS, bool).at[NOPPL].set(False)
        av_pwr = jnp.ones(N_POWER_KINDS, bool).at[NOPOWER].set(False)
        deck_ppl = s[R_D:R_D + DECK_SIZE, 1]
        deck_pwr = s[R_D:R_D + DECK_SIZE, 2]
        av_ppl = av_ppl.at[jnp.clip(deck_ppl, 0, N_PEOPLE_KINDS - 1)] \
            .set(False)
        av_pwr = av_pwr.at[jnp.clip(deck_pwr, 0, N_POWER_KINDS - 1)] \
            .set(False)
        hand_ppl = jnp.abs(s[R_P:R_P + 3 * n, 1])
        hand_pwr = jnp.abs(s[R_P:R_P + 3 * n, 2])
        hand_ppl = jnp.where(hand_ppl != NOPPL, hand_ppl, 0)
        av_ppl = av_ppl.at[jnp.clip(hand_ppl, 0, N_PEOPLE_KINDS - 1)] \
            .set(False)
        av_ppl = av_ppl.at[NOPPL].set(False)
        hand_pwr = jnp.where(hand_pwr != NOPOWER, hand_pwr, 0)
        av_pwr = av_pwr.at[jnp.clip(hand_pwr, 0, N_POWER_KINDS - 1)] \
            .set(False)
        av_pwr = av_pwr.at[NOPOWER].set(False)
        s = s.at[R_ID, 0:2].set(_pack_bits(av_ppl, 2))
        return s.at[R_ID, 2:5].set(_pack_bits(av_pwr, 3))

    # ---------------- phase transitions -------------------------------------

    def switch_status_berserk(s, ridx, next_status: int, key, seed):
        """reference _switch_status_berserk (:1191-1204); static next."""
        cur = s[ridx]
        is_b = cur[2] == BERSERK
        if next_status in (P_READY, P_ABANDON, P_CHOOSE, P_CONQUEST):
            s2, dice = roll_dice(s, key, seed)
            s2 = s2.at[ridx, 4].set(dice + 64)
            return jnp.where(is_b, s2, s)
        return jnp.where(is_b, s.at[ridx, 4].set(0), s)

    def switch_to_next(s, ridx, key, seed):
        """reference _switch_to_next (:1235-1285); mover is player 0."""
        was_declined_turn = s[R_GS, 4] != ACTIVE
        cur = s[ridx]
        # resets on the people that just finished
        reset3 = (cur[1] == SKELETON) | (cur[1] == SORCERER)
        s = s.at[ridx, 3].set(jnp.where(reset3, 0, cur[3]))
        keep4 = (cur[2] == WEALTHY) | (cur[2] == BIVOUACKING) | \
            (cur[2] == HEROIC) | (cur[2] == DIPLOMAT)
        new4 = jnp.where(cur[2] == FORTIFIED, cur[4] % 64,
                         jnp.where(keep4, cur[4], 0))
        s = s.at[ridx, 4].set(new4)
        s = s.at[R_RS, 3].set(0)
        # same player replays (declined-ghoul turn) or hand to next player
        np_ = jnp.where(was_declined_turn, 0, 1 % n)
        ds1 = s[R_P + 3 * (1 % n) + DECLINED_SPIRIT, 1]
        d1 = s[R_P + 3 * (1 % n) + DECLINED, 1]
        nid_next = jnp.where(ds1 == -GHOUL, DECLINED_SPIRIT,
                             jnp.where(d1 == -GHOUL, DECLINED, ACTIVE))
        nid = jnp.where(was_declined_turn, ACTIVE, nid_next)
        s = jnp.where(was_declined_turn, s,
                      s.at[R_GS, 3].add(1).at[R_GS, 4].set(-1)
                      .at[R_RS, 4].set(P_WAIT))
        s = s.at[R_GS + np_, 4].set(nid)
        s = s.at[R_RS + np_, 4].set(P_READY)
        # _prepare_for_ready (:1108-1125): only the berserk pre-roll acts
        return switch_status_berserk(s, R_P + 3 * np_ + nid, P_READY,
                                     key, seed)

    def prepare(s, ridx, next_status: int, key, seed):
        """reference _prepare_for_new_status (:1070-1105); static next."""
        old = s[R_RS, 4]
        cur = s[ridx]
        if next_status in (P_ABANDON, P_CONQUEST, P_CONQ_DICE):
            s = jnp.where(old == P_READY, gather_but_one(s, ridx), s)
        elif next_status == P_REDEPLOY:
            in_old = (old == P_READY) | (old == P_CONQUEST) | \
                (old == P_CONQ_DICE) | (old == P_AB_AMAZONS)
            s = jnp.where(in_old, gather_but_one(s, ridx), s)
        cur = s[ridx]

        if next_status == P_CONQUEST:
            am = (cur[1] == AMAZON) & \
                ((old == P_READY) | (old == P_CHOOSE) |
                 (old == P_ABANDON)) & (cur[3] == 0)
            s = jnp.where(am, s.at[ridx, 0].add(4).at[ridx, 3].set(4), s)
        elif next_status == P_REDEPLOY:
            am = (cur[1] == AMAZON) & \
                ((old == P_CONQUEST) | (old == P_CONQ_DICE) |
                 (old == P_AB_AMAZONS)) & (cur[3] != 0)
            s = jnp.where(am, s.at[ridx, 0].add(-cur[3]).at[ridx, 3].set(0),
                          s)
            cur = s[ridx]
            sk = (cur[1] == SKELETON) & \
                ((old == P_READY) | (old == P_CHOOSE) | (old == P_ABANDON) |
                 (old == P_CONQUEST) | (old == P_CONQ_DICE) |
                 (old == P_AB_AMAZONS)) & (cur[3] == 0)
            added = limit_added(s, ridx, s[R_RS, 3] // 2, MAX_SKELETONS)
            s = jnp.where(sk, s.at[ridx, 0].add(added).at[ridx, 3].set(1), s)
        cur = s[ridx]

        if next_status == P_CONQUEST:
            gather_pwr = (old == P_READY) | (old == P_CHOOSE) | \
                (old == P_ABANDON)
            occ = occ_by(s, cur[1])
            has = occ & (s[:A, 4] > 0)
            biv = (cur[2] == BIVOUACKING) & gather_pwr
            s_biv = s.at[ridx, 4].add(jnp.sum(s[:A, 4] * has)) \
                .at[:A, 5].add(-s[:A, 4] * has) \
                .at[:A, 4].set(jnp.where(has, 0, s[:A, 4]))
            s = jnp.where(biv, s_biv, s)
            her = (cur[2] == HEROIC) & gather_pwr
            s_her = s.at[ridx, 4].add(jnp.sum(has)) \
                .at[:A, 5].add(-s[:A, 4] * has) \
                .at[:A, 4].set(jnp.where(has, 0, s[:A, 4]))
            s = jnp.where(her, s_her, s)
            dip = (s[ridx][2] == DIPLOMAT) & gather_pwr
            s = jnp.where(dip, s.at[ridx, 4].set(64), s)
        if next_status == P_WAIT:
            cur = s[ridx]
            dip = (cur[2] == DIPLOMAT) & (old != P_WAIT) & (cur[4] >= 64)
            s = jnp.where(dip, s.at[ridx, 4].set(0), s)
        if next_status != P_CONQUEST:
            s = switch_status_berserk(s, ridx, next_status, key, seed)

        if next_status == P_STOUT_DECL:
            s = jnp.where(s[ridx][2] == STOUT, compute_and_update_score(s),
                          s)
        if next_status == P_WAIT:
            do_score = (s[R_GS, 4] == ACTIVE) & (old != P_STOUT_DECL)
            s = jnp.where(do_score, compute_and_update_score(s), s)
            s = switch_to_next(s, ridx, key, seed)
        return s

    # ---------------- territory transfer ------------------------------------

    def give_back_tokens(s, lidx, area):
        t = s[area]
        back = jnp.where((t[2] == BIVOUACKING) | (t[2] == FORTIFIED), t[4],
                         jnp.where((t[2] == HEROIC) & (t[4] > 0), 1, 0))
        return s.at[lidx, 4].add(back)

    def leave_area(s, area):
        """reference _leave_area (:1000-1012)."""
        lidx, _, found = owner_of(s, area)
        s2 = s.at[lidx, 0].add(s[area, 0])
        s2 = give_back_tokens(s2, lidx, area)
        s = jnp.where(found, s2, s)
        empty = jnp.array([0, NOPPL, NOPOWER, 0, 0, 0, 0, -1], jnp.int32)
        s = s.at[area].set(empty)
        return s.at[area, 5].set(is_mountain[area])

    def switch_territory(s, area, ridx, nb_attacking):
        """reference _switch_territory_from_loser_to_winner (:1014-1045)."""
        nb_initial = s[area, 0]
        lidx, lp, found = owner_of(s, area)
        lose1 = jnp.where(s[area, 1] != ELF, 1, 0)
        s2 = s.at[lidx, 0].add(s[area, 0] - lose1)
        s2 = give_back_tokens(s2, lidx, area)
        dip = s2[ridx][2] == DIPLOMAT
        bit = 2 ** jnp.mod(0 - lp, n)
        s2 = jnp.where(dip, s2.at[ridx, 4].set(s2[ridx, 4] | bit), s2)
        s = jnp.where(found, s2, s)
        cur = s[ridx]
        s = s.at[area, 0].set(nb_attacking)
        s = s.at[area, 1].set(cur[1]).at[area, 2].set(cur[2])
        s = s.at[area, 3:7].set(jnp.zeros(4, jnp.int32))
        s = s.at[area, 7].set(0)
        s = s.at[ridx, 0].add(-nb_attacking)
        s = jnp.where(found, upd_round_status(s, lidx, lp), s)
        s = upd_territory_after(s, ridx, 0, area)
        return jnp.where(nb_initial > 0, s.at[R_RS, 3].add(1), s)

    # ---------------- the 8 move families ------------------------------------

    def do_abandon(s, area, key, seed):
        ridx = cur_ridx(s)
        s = leave_area(s, area)
        old = s[R_RS, 4]
        in_conq = (old == P_CONQUEST) | (old == P_CONQ_DICE) | \
            (old == P_AB_AMAZONS)
        can_red = virt_avail(s, ridx, P_REDEPLOY) >= 0
        s_red = prepare(s, ridx, P_REDEPLOY, key, seed) \
            .at[R_RS, 4].set(P_REDEPLOY)
        s_am = prepare(s, ridx, P_AB_AMAZONS, key, seed) \
            .at[R_RS, 4].set(P_AB_AMAZONS)
        s_ab = prepare(s, ridx, P_ABANDON, key, seed) \
            .at[R_RS, 4].set(P_ABANDON)
        s = jnp.where(in_conq, jnp.where(can_red, s_red, s_am), s_ab)
        return upd_round_status(s, ridx, 0)

    def do_attack(s, area, key, seed):
        ridx = cur_ridx(s)
        s1 = prepare(s, ridx, P_CONQUEST, key, seed)
        cur = s1[ridx]
        matk = min_attack(s1, area, cur)
        nb = cur[0]
        use_dice = nb < matk
        bers = (cur[2] == BERSERK) & (cur[4] >= 64)
        bdice = cur[4] % 64
        s_d, dice = roll_dice(s1, key, seed)

        fail_b = bers & (nb + bdice < matk)
        fail_d = ~bers & use_dice & (nb + dice < matk)

        nb_att = jnp.where(bers, jnp.maximum(matk - bdice, 1),
                           jnp.where(use_dice, nb, matk))
        s_succ = jnp.where(~bers & use_dice, s_d, s1)
        s_succ = switch_territory(s_succ, area, ridx, nb_att)
        s_succ = switch_status_berserk(s_succ, ridx, P_CONQUEST, key, seed)
        s_succ = s_succ.at[R_RS, 4].set(
            jnp.where(use_dice, P_CONQ_DICE, P_CONQUEST))
        s_succ = upd_round_status(s_succ, ridx, 0)

        s_fail_b = s1.at[R_RS, 4].set(P_CONQ_DICE)
        s_fail_d = s_d.at[R_RS, 4].set(P_CONQ_DICE)
        return jnp.where(fail_b, s_fail_b,
                         jnp.where(fail_d, s_fail_d, s_succ))

    def do_special_ppl(s, area, key, seed):
        """Sorcerer capture (reference _do_special_actionppl, :703-722)."""
        ridx = cur_ridx(s)
        lidx, lp, _ = owner_of(s, area)
        s = prepare(s, ridx, P_CONQUEST, key, seed)
        cur = s[ridx]
        row = jnp.array([1, SORCERER, 0, 0, 0, 0, 0, 0], jnp.int32)
        row = row.at[2].set(cur[2])
        s = s.at[area].set(row)
        s = s.at[ridx, 3].set(cur[3] | (2 ** jnp.mod(0 - lp, n)))
        s = s.at[R_RS, 4].set(P_CONQUEST).at[R_RS, 3].add(1)
        s = upd_territory_after(s, lidx, lp, area)
        s = upd_territory_after(s, ridx, 0, area)
        return upd_round_status(s, ridx, 0)

    def do_special_pwr(s, area, key, seed):
        ridx = cur_ridx(s)
        pwr = s[ridx][2]

        def to_redeploy(st):
            st = prepare(st, ridx, P_REDEPLOY, key, seed)
            return st.at[R_RS, 4].set(P_REDEPLOY)

        s_biv = s.at[area, 4].add(1).at[area, 5].add(1).at[ridx, 4].add(-1)
        s_biv = upd_round_status(to_redeploy(s_biv), ridx, 0)

        s_fort = s.at[area, 4].add(1).at[area, 5].add(1).at[area, 6].add(1) \
            .at[ridx, 4].add(-1)
        s_fort = s_fort.at[ridx, 4].set(s_fort[ridx, 4] | 64)
        s_fort = upd_round_status(to_redeploy(s_fort), ridx, 0)

        s_her = s.at[area, 5].add(IMMUNITY - s[area, 4]) \
            .at[area, 4].set(IMMUNITY).at[ridx, 4].add(-1)
        s_her = upd_round_status(to_redeploy(s_her), ridx, 0)

        s_dip = s.at[ridx, 4].set(area)          # area = relative player id
        s_dip = to_redeploy(s_dip)

        occ = occ_by(s, s[ridx][1])
        hasd = occ & (s[:A, 4] != 0)
        s_drg = s.at[:A, 5].add(-s[:A, 4] * hasd) \
            .at[:A, 4].set(jnp.where(hasd, 0, s[:A, 4]))
        s_drg = prepare(s_drg, ridx, P_CONQUEST, key, seed)
        s_drg = switch_territory(s_drg, area, ridx, 1)
        s_drg = s_drg.at[area, 5].add(IMMUNITY).at[area, 4].set(IMMUNITY)
        s_drg = s_drg.at[ridx, 4].set(1).at[R_RS, 4].set(P_CONQUEST)
        s_drg = upd_round_status(s_drg, ridx, 0)

        s = jnp.where(pwr == BIVOUACKING, s_biv,
             jnp.where(pwr == FORTIFIED, s_fort,
              jnp.where(pwr == HEROIC, s_her,
               jnp.where(pwr == DIPLOMAT, s_dip,
                jnp.where(pwr == DRAGONMASTER, s_drg, s)))))
        return s

    def valid_end_aux(s, ridx):
        cur = s[ridx]
        ok = (s[R_RS, 4] == P_REDEPLOY) & (cur[1] != NOPPL)
        n_occ = jnp.sum(occ_by(s, cur[1]))
        hand = (cur[0] > 0) & (n_occ > 0)
        amazon_ok = (cur[1] == AMAZON) & (cur[0] == cur[3])
        ok &= ~hand | amazon_ok
        return ok & enough_amazons(s, ridx)

    def do_end(s, key, seed):
        ridx = cur_ridx(s)
        s = upd_round_status(s, ridx, 0)
        return prepare(s, ridx, P_WAIT, key, seed)

    def end_turn_if_possible(s, key, seed):
        """reference _end_turn_if_possible (:1127-1145)."""
        ridx = cur_ridx(s)
        cur = s[ridx]
        blocked = (cur[0] > 0) | (cur[2] == STOUT) | \
            (((cur[2] == BIVOUACKING) | (cur[2] == FORTIFIED) |
              (cur[2] == HEROIC)) & (cur[4] > 0)) | ~valid_end_aux(s, ridx)
        return jnp.where(blocked, s, do_end(s, key, seed))

    def do_redeploy(s, param, key, seed):
        ridx = cur_ridx(s)
        s = prepare(s, ridx, P_REDEPLOY, key, seed)
        s = s.at[R_RS, 4].set(P_REDEPLOY)
        occ = occ_by(s, s[ridx][1])
        is_bulk = (param > 0) & (param < MAX_REDEPLOY)
        k = jnp.where(is_bulk, param, 0)
        s = s.at[:A, 0].add(k * occ).at[:A, 5].add(k * occ)
        s = s.at[ridx, 0].add(-k * jnp.sum(occ))
        area = jnp.clip(param - MAX_REDEPLOY, 0, A - 1)
        one = (param >= MAX_REDEPLOY).astype(jnp.int32)
        s = s.at[area, 0].add(one).at[area, 5].add(one)
        s = s.at[ridx, 0].add(-one)
        s = upd_round_status(s, ridx, 0)
        return end_turn_if_possible(s, key, seed)

    def do_choose(s, index, key, seed):
        """reference _do_choose_ppl (:601-614) + deck shift (:1358-1389)."""
        ridx = R_P + ACTIVE
        combo = s[R_D + jnp.clip(index, 0, DECK_SIZE - 1)]
        cur = jnp.zeros(8, jnp.int32).at[7].set(0)
        cur = cur.at[0].set(combo[0]).at[1].set(combo[1]) \
            .at[2].set(combo[2])
        cur = cur.at[3].set(init_tok[combo[1]])
        cur = cur.at[4].set(init_tok_pwr[combo[2]])
        s = s.at[ridx].set(cur)
        s = s.at[R_GS, 6].add(combo[6] - index)
        s = prepare(s, ridx, P_CHOOSE, key, seed)
        s = s.at[R_RS, 4].set(P_CHOOSE)
        # shift deck rows above `index` up, give coins to earlier combos
        idx6 = jnp.arange(DECK_SIZE)
        src = jnp.minimum(idx6 + (idx6 >= index), DECK_SIZE - 1)
        deck = s[R_D:R_D + DECK_SIZE][src]
        deck = deck.at[:, 6].add((idx6 < index).astype(jnp.int32))
        s = s.at[R_D:R_D + DECK_SIZE].set(deck)
        s, _ = draw_combo(s, key, seed, DECK_SIZE - 1)
        return s

    def do_decline(s, key, seed):
        """reference _do_decline (:534-580)."""
        ridx = R_P + ACTIVE
        cur = s[ridx]
        is_stout = cur[2] == STOUT
        s_st = prepare(s, ridx, P_STOUT_DECL, key, seed) \
            .at[R_RS, 4].set(P_STOUT_DECL)
        s = jnp.where(is_stout, s_st, s)
        cur = s[ridx]
        did = jnp.where(cur[2] == SPIRIT, DECLINED_SPIRIT, DECLINED)
        didx = R_P + did
        # clear a previously declined people from the board + hand
        old_decl = s[didx]
        occ_old = occ_by(s, old_decl[1])
        empty = jnp.array([0, NOPPL, NOPOWER, 0, 0, 0, 0, -1], jnp.int32)
        cleared = jnp.where(occ_old[:, None], empty[None, :], s[:A])
        cleared = cleared.at[:, 5].set(
            jnp.where(occ_old, is_mountain, cleared[:, 5]))
        s_cl = s.at[:A].set(cleared)
        s_cl = s_cl.at[didx, 0:7].set(jnp.zeros(7, jnp.int32))
        s_cl = rebuild_avail_from_play(s_cl)
        refill = s_cl[R_D:R_D + DECK_SIZE, 0] == NOPPL
        for i in range(DECK_SIZE):
            s_new, _ = draw_combo(s_cl, jax.random.fold_in(key, 300 + i),
                                  seed, i)
            s_cl = jnp.where(refill[i], s_new, s_cl)
        s = jnp.where(old_decl[1] != NOPPL, s_cl, s)
        # move current people to decline: ghouls keep their hand, everyone
        # else only leaves 1 token per territory (gathered hand goes to the
        # box — the declined hand count stays 0, reference :556-562)
        cur = s[ridx]
        s_g = s.at[didx, 0].set(cur[0])
        s_ng = gather_but_one(s, ridx)
        s = jnp.where(cur[1] == GHOUL, s_g, s_ng)
        s = s.at[didx, 1].set(cur[1])
        s = s.at[ridx, 0:7].set(jnp.zeros(7, jnp.int32))
        # flip board tokens of the declining people
        dtyp = s[didx, 1]                       # still positive here
        flip = occ_by(s, dtyp)
        keep4 = jnp.where(flip & (s[:A, 2] == FORTIFIED), s[:A, 4], 0)
        s = s.at[:A, 1].set(jnp.where(flip, -dtyp, s[:A, 1]))
        for col in range(2, 7):
            s = s.at[:A, col].set(jnp.where(flip, 0, s[:A, col]))
        s = s.at[:A, 4].set(jnp.where(flip, keep4, s[:A, 4]))
        # per-area refresh (reference calls _update_territory_... per area)
        t = s[:A]
        d5 = t[:, 0] + t[:, 3] + t[:, 4] + is_mountain \
            + (jnp.abs(t[:, 1]) == TROLL).astype(jnp.int32)
        d6 = 1 + ((descr[:, MINE] != 0) & (jnp.abs(t[:, 1]) == DWARF)) \
            .astype(jnp.int32)
        s = s.at[:A, 5].set(jnp.where(flip, d5, t[:, 5]))
        s = s.at[:A, 6].set(jnp.where(flip, d6, t[:, 6]))
        s = s.at[:A, 7].set(jnp.where(flip, 0, t[:, 7]))
        s = s.at[didx, 1].set(-dtyp)
        s = s.at[didx, 2].set(-s[didx, 2])
        s = upd_round_status(s, didx, 0)
        # prepare(WAIT) scores and hands over; the reference's trailing
        # `round_status[player,4] = PHASE_WAIT` is redundant after it
        return prepare(s, ridx, P_WAIT, key, seed)

    # ---------------- valids -------------------------------------------------

    def valids(state):
        s = _i32(state)
        ridx = cur_ridx(s)
        cur = s[ridx]
        rs4 = s[R_RS, 4]
        has_ppl = cur[1] != NOPPL
        occ = occ_by(s, cur[1]) & has_ppl
        n_occ = jnp.sum(occ)

        # --- abandon (reference :616-632)
        ab_phase = (rs4 == P_READY) | (rs4 == P_ABANDON) | \
            (rs4 == P_AB_AMAZONS)
        amazon_exc = (cur[1] == AMAZON) & \
            ((rs4 == P_CONQUEST) | (rs4 == P_CONQ_DICE)) & \
            (virt_avail(s, ridx, P_REDEPLOY) < 0)
        v_abandon = occ & (ab_phase | amazon_exc)

        # --- attack (reference :342-405)
        atk_phase = (rs4 == P_READY) | (rs4 == P_CHOOSE) | \
            (rs4 == P_ABANDON) | (rs4 == P_CONQUEST)
        avail = virt_avail(s, ridx, P_CONQUEST)
        bers = (cur[2] == BERSERK) & (cur[4] >= 64)
        avail_atk = avail + jnp.where(bers, cur[4] % 64, 0)
        cond = ~occ & (s[:A, 5] < IMMUNITY)
        cond &= (terrain != WATER) | (cur[2] == SEAFARING)
        neigh = (conn & occ[None, :]).sum(axis=1) > 0
        cavern_adj = jnp.any((descr[:, CAVERN] != 0) & occ)
        neigh |= (cur[2] == UNDERWORLD) & cavern_adj & (descr[:, CAVERN] != 0)
        first = n_occ == 0
        reach = jnp.where(cur[2] == FLYING, True,
                          jnp.where(first,
                                    jnp.where(cur[1] == HALFLING, True,
                                              at_edge), neigh))
        cond &= reach
        matk = min_attack_vec(s, cur)
        chance = avail_atk + jnp.where(cur[2] == BERSERK, 0, MAX_DICE) >= matk
        # diplomat-in-peace guard
        types = s[R_P:R_P + 3 * n, 1]
        match = s[:A, 1, None] == types[None, :]
        lflat = jnp.argmax(match, axis=1)
        l4 = s[R_P + lflat, 4]
        lp = lflat // 3
        peace = (s[:A, 2] == DIPLOMAT) & (cur[1] > 0) & \
            jnp.any(match, axis=1) & (l4 == jnp.mod(0 - lp, n))
        v_attack = atk_phase & (avail > 0) & has_ppl & cond & chance & ~peace

        # --- sorcerer (reference :651-698)
        sorc = (cur[1] == SORCERER) & atk_phase & \
            (total_ppl(s, ridx) + 1 <= MAX_SORCERERS)
        sc = (terrain != WATER) | (cur[2] == SEAFARING)
        sc &= (s[:A, 0] == 1) & (s[:A, 1] > 0) & ~occ
        sc &= (s[:A, 3] < IMMUNITY) & (s[:A, 4] < IMMUNITY)
        sc &= jnp.where(cur[2] == FLYING, True,
                        (conn & occ[None, :]).sum(axis=1) > 0)
        already = (cur[3] & (2 ** jnp.mod(0 - lp, n))) != 0
        sc &= ~(jnp.any(match, axis=1) & already)
        l2 = s[R_P + lflat, 2]
        sc &= ~(jnp.any(match, axis=1) & (l2 == BIVOUACKING) &
                (s[:A, 4] > 0))
        v_sorcerer = sorc & sc

        # --- special power (reference :724-805)
        red_phase = (rs4 == P_CONQUEST) | (rs4 == P_CONQ_DICE) | \
            (rs4 == P_REDEPLOY)
        amz_ok = enough_amazons(s, ridx)
        pw = cur[2]
        v_pwr = jnp.zeros(A, bool)
        v_biv = red_phase & (cur[4] > 0) & amz_ok & occ
        v_pwr = jnp.where(pw == BIVOUACKING, v_biv, v_pwr)
        v_fort = red_phase & (cur[4] % 64 > 0) & (cur[4] < 64) & amz_ok & \
            occ & (s[:A, 4] <= 0)
        v_pwr = jnp.where(pw == FORTIFIED, v_fort, v_pwr)
        v_her = red_phase & (cur[4] > 0) & amz_ok & occ & (s[:A, 4] <= 0)
        v_pwr = jnp.where(pw == HEROIC, v_her, v_pwr)
        dip_phase = (rs4 == P_CONQUEST) | (rs4 == P_CONQ_DICE)
        rel = jnp.mod(0 - jnp.arange(A), n)
        v_dip = dip_phase & amz_ok & (jnp.arange(A) < n) & \
            ((cur[4] & (2 ** rel)) == 0)
        v_pwr = jnp.where(pw == DIPLOMAT, v_dip, v_pwr)
        v_drg = atk_phase & (cur[4] <= 0) & (cur[0] >= 1) & \
            (terrain != WATER) & ~occ & \
            (s[:A, 3] < IMMUNITY) & (s[:A, 4] < IMMUNITY) & \
            ((conn & occ[None, :]).sum(axis=1) > 0)
        v_pwr = jnp.where(pw == DRAGONMASTER, v_drg, v_pwr)
        v_pwr &= has_ppl

        # --- redeploy (reference :451-488)
        v_red = jnp.zeros(MAX_REDEPLOY + A, bool)
        red_ok = has_ppl & (rs4 != P_WAIT) & (rs4 != P_AB_AMAZONS)
        hm = virt_avail(s, ridx, P_REDEPLOY)
        ks = jnp.arange(MAX_REDEPLOY)
        v_bulk = (ks >= 1) & (hm >= ks * n_occ)
        v_area = occ
        normal = (n_occ > 0) & (hm > 0)
        v_red = v_red.at[:MAX_REDEPLOY].set(v_bulk & normal & red_ok)
        v_red = v_red.at[MAX_REDEPLOY:].set(v_area & normal & red_ok)
        # skip-redeploy allowed when stuck (no territory, or nothing left to
        # deploy — the hm<0 amazon case forbids everything, reference :477)
        stuck = (n_occ == 0) | ((hm == 0) & (n_occ > 0))
        allow_skip = red_ok & stuck & (rs4 != P_REDEPLOY)
        v_red = v_red.at[0].set(allow_skip)

        # --- choose people (reference :582-598)
        v_choose = (rs4 == P_READY) & (s[R_GS, 4] == ACTIVE) & \
            (s[R_P + ACTIVE, 1] == NOPPL) & \
            (s[R_D:R_D + DECK_SIZE, 1] != NOPPL) & \
            (s[R_GS, 6] + SCORE_OFFSET >= jnp.arange(DECK_SIZE))

        # --- decline (reference :522-532)
        act = s[R_P + ACTIVE]
        v_decline = (s[R_GS, 4] == ACTIVE) & (act[1] != NOPPL) & \
            ((rs4 == P_READY) |
             (((rs4 == P_CONQUEST) | (rs4 == P_CONQ_DICE) |
               (rs4 == P_REDEPLOY)) & (act[2] == STOUT)))

        v_end = valid_end_aux(s, ridx)

        return jnp.concatenate([
            v_abandon, v_attack, v_sorcerer, v_pwr, v_red, v_choose,
            v_decline[None], v_end[None]])

    # ---------------- step ----------------------------------------------------

    def step(state, action, key, seed):
        action = jnp.asarray(action, jnp.int32)
        seed = jnp.asarray(seed, jnp.int32)
        s = _i32(state)

        area = jnp.mod(action, A)
        fam = jnp.where(action < 4 * A, action // A,
               jnp.where(action < 5 * A + MAX_REDEPLOY, 4,
                jnp.where(action < 5 * A + MAX_REDEPLOY + DECK_SIZE, 5,
                 jnp.where(action < num_actions - 1, 6, 7))))
        red_param = jnp.clip(action - 4 * A, 0, MAX_REDEPLOY + A - 1)
        deck_idx = jnp.clip(action - 5 * A - MAX_REDEPLOY, 0, DECK_SIZE - 1)

        s = jax.lax.switch(
            fam,
            [lambda st: do_abandon(st, area, key, seed),
             lambda st: do_attack(st, area, key, seed),
             lambda st: do_special_ppl(st, area, key, seed),
             lambda st: do_special_pwr(st, area, key, seed),
             lambda st: do_redeploy(st, red_param, key, seed),
             lambda st: do_choose(st, deck_idx, key, seed),
             lambda st: do_decline(st, key, seed),
             lambda st: do_end(st, key, seed)],
            s)
        nxt = jnp.where(s[R_GS, 4] >= 0, 0, 1)
        return _to_int8(s), nxt.astype(jnp.int32)

    # ---------------- canonical / terminal / misc ----------------------------

    def canonical(state, swap):
        """reference swap_players (:260-279): roll player rows (cols 0..6)."""
        k = swap % n
        s = _i32(state)
        p_src = (jnp.arange(n) + k) % n
        ppl = s[R_P:R_P + 3 * n].reshape(n, 3, 8)[p_src].reshape(3 * n, 8)
        st = s.at[R_P:R_P + 3 * n, :7].set(ppl[:, :7])
        st = st.at[R_RS:R_RS + n, :7].set(s[R_RS + p_src, :7])
        st = st.at[R_GS:R_GS + n, :7].set(s[R_GS + p_src, :7])
        owner = s[:A, 7]
        st = st.at[:A, 7].set(
            jnp.where(owner >= 0, jnp.mod(owner - k, n), owner))
        return jnp.where(k == 0, state, _to_int8(st))

    def terminal(state):
        s = _i32(state)
        rnd = jnp.min(s[R_GS:R_GS + n, 3])
        ended = rnd > nb_rounds
        scores = s[R_GS:R_GS + n, 6]
        best = jnp.max(scores)
        single = jnp.sum(scores == best) == 1
        res = jnp.where(scores == best, jnp.where(single, 1.0, 0.01), -1.0)
        return jnp.where(ended, res, 0.0).astype(jnp.float32)

    def get_score(state, player):
        return (_i32(state)[R_GS + player, 6] + SCORE_OFFSET) \
            .astype(jnp.float32)

    def get_round(state):
        return jnp.min(_i32(state)[R_GS:R_GS + n, 3])

    def init(key):
        s = jnp.zeros((n_rows, 8), jnp.int32)
        # map with lost tribes (reference init_game, :150-174)
        nb_lt = int(INITIAL_NB_PPL[-LOST_TRIBE])
        has_lt = descr[:, 4] != 0
        trow = jnp.where(
            has_lt[:, None],
            jnp.array([nb_lt, LOST_TRIBE, NOPOWER, 0, 0, 0, 0, -1],
                      jnp.int32)[None, :],
            jnp.array([0, NOPPL, NOPOWER, 0, 0, 0, 0, -1],
                      jnp.int32)[None, :])
        trow = trow.at[:, 5].set(
            jnp.where(has_lt, nb_lt + is_mountain, is_mountain))
        s = s.at[:A].set(trow)
        # deck: all kinds available, then 6 PRNG draws
        av_ppl = jnp.ones(N_PEOPLE_KINDS, bool).at[NOPPL].set(False)
        av_pwr = jnp.ones(N_POWER_KINDS, bool).at[NOPOWER].set(False)
        s = s.at[R_ID, 0:2].set(_pack_bits(av_ppl, 2))
        s = s.at[R_ID, 2:5].set(_pack_bits(av_pwr, 3))
        for i in range(DECK_SIZE):
            s, _ = draw_combo(s, jax.random.fold_in(key, i), jnp.int32(0), i)
        s = s.at[R_ID, 6].set(0)
        # statuses and scores
        s = s.at[R_RS, 4].set(P_READY)
        for p in range(1, n):
            s = s.at[R_RS + p, 4].set(P_WAIT)
        s = s.at[R_RS:R_RS + n, 7].set(jnp.arange(n))
        s = s.at[R_GS, 4].set(ACTIVE)
        for p in range(1, n):
            s = s.at[R_GS + p, 4].set(-1)
        s = s.at[R_GS:R_GS + n, 6].set(SCORE_INIT - SCORE_OFFSET)
        s = s.at[R_GS:R_GS + n, 7].set(jnp.arange(n))
        ppl_rows = s[R_P:R_P + 3 * n].reshape(n, 3, 8)
        ppl_rows = ppl_rows.at[:, :, 7].set(
            jnp.arange(n)[:, None].repeat(3, 1))
        s = s.at[R_P:R_P + 3 * n].set(ppl_rows.reshape(3 * n, 8))
        s = s.at[R_GS:R_GS + n, 3].add(1)    # first round is round 1
        return _to_int8(s)

    def observe(state):
        return state.astype(jnp.float32)

    def symmetries(state, pi, valid):
        """Deterministic analog of the reference's random score-offset
        augmentation (get_symmetries, :286-296): shift all scores by a
        common offset — score differences, not levels, drive the game."""
        s = _i32(state)
        scores = s[R_GS:R_GS + n, 6]
        lo = -127 - jnp.min(scores)
        hi = 127 - jnp.max(scores)

        def shifted(frac_num, frac_den):
            off = lo + (hi - lo) * frac_num // frac_den
            st = s.at[R_GS:R_GS + n, 6].add(off).astype(jnp.int8)
            return jnp.where(lo < hi, st, state)

        return (jnp.stack([state, shifted(1, 3), shifted(2, 3)]),
                jnp.stack([pi, pi, pi]),
                jnp.stack([valid, valid, valid]))

    return GameSpec(
        name=f"smallworld_{n}p",
        num_players=n,
        state_shape=(n_rows, 8),
        obs_shape=(n_rows, 8),
        num_actions=num_actions,
        max_game_length=350 * n,
        init=init,
        valids=valids,
        step=step,
        canonical=canonical,
        terminal=terminal,
        observe=observe,
        get_round=get_round,
        get_score=get_score,
        symmetries=symmetries,
        num_symmetries=3,
        meta=SmallworldMeta(num_players=n, nb_areas=A, nb_rounds=nb_rounds),
    )
