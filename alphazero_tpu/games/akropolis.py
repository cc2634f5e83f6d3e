"""Akropolis — TPU-native vectorized engine.

Behavioral reference: /root/reference/akropolis/AkropolisLogicNumba.py (611
LoC) + AkropolisConstants.py.  Hex tile-laying game on a 13x13 odd-r offset
grid: players draft triple-hex tiles from a shared construction site and
stack them into a 3D city; five district colors score by distinct adjacency
rules (gardens, isolated markets, surrounded temples, periphery barracks,
largest house group), each multiplied by matching plaza stars.

From-scratch functional JAX implementation.  All the reference's per-cell
Python loops become neighbor-table gathers; the two graph analyses (the
outer-empty flood fill for RED and the connected-component houses for BLUE)
are fixpoint label/dilation propagations under `lax.while_loop`.

State layout is identical to the reference (AkropolisLogicNumba.py:7-51):
(13, 13, 3n+2) int8 — per player descr/height/tileID planes, then one plane
of packed per-player scalars (plazas, districts, encoded score, stones) and
one plane of global scalars (construction site, tile-deck bitfield, round,
remaining stacks).  Action = slot * 1014 + cell * 6 + orient
(AkropolisLogicNumba.py:53-64).

Chance: construction-site refills.  seed != 0 reproduces the reference's
LCG draw bit-exactly: rnd = (2014*(seed+round)+42) % 61, tile =
available[rnd % len] (AkropolisLogicNumba.py:503-518; max operand ~6.4e7 so
int32 is exact).  seed == 0 draws uniformly from the PRNG key.

Known reference divergence (intentional): the reference's get_symmetries
rotates the hex grid about the CORNER cell (0,0) (AkropolisLogicNumba.py:
95-114), which drops the entire city — including the mandatory start tile —
off-board for k in 1..5 (only 1-49 of 169 cells survive).  That is a bug,
not a symmetry.  We rotate about the START tile (6,6), the true D6 symmetry
axis of the game; cells/actions whose rotation leaves the board are dropped
(they are empty in any reachable compact city).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from alphazero_tpu.games.base import GameSpec

# ---------------------------------------------------------------------------
# constants (AkropolisConstants.py)
# ---------------------------------------------------------------------------

CITY_SIZE = 13
CITY_AREA = CITY_SIZE * CITY_SIZE
N_ORIENTS = 6
N_PATTERNS = CITY_AREA * N_ORIENTS
N_STACKS = 11
N_COLORS = 5
START_R = START_Q = CITY_SIZE // 2
START_CELL = START_R * CITY_SIZE + START_Q

EMPTY, QUARRY = 0, 1
D_BLUE, D_YELLOW, D_RED, D_PURPLE, D_GREEN = 2, 3, 4, 5, 6
P_BLUE, P_YELLOW, P_RED, P_PURPLE, P_GREEN = 7, 8, 9, 10, 11
BLUE, YELLOW, RED, PURPLE, GREEN = range(N_COLORS)
PLAZA_STARS = np.array([1, 2, 2, 2, 3], np.int32)
# descr code -> (is_plaza, is_quarry, color); colors for plazas/districts
DESCR_COLOR = np.array([0, 0, BLUE, YELLOW, RED, PURPLE, GREEN,
                        BLUE, YELLOW, RED, PURPLE, GREEN], np.int32)

# odd-r offset neighbor deltas (dq, dr):    SW      SE      E      NE      NW      W
_DIR_EVEN = [(-1, 1), (0, 1), (1, 0), (0, -1), (-1, -1), (-1, 0)]
_DIR_ODD = [(0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, 0)]

# 61 tile triples + min player count (AkropolisConstants.py:97-161)
_T = {'Q': QUARRY, 'B': D_BLUE, 'Y': D_YELLOW, 'R': D_RED, 'P': D_PURPLE,
      'G': D_GREEN, 'b': P_BLUE, 'y': P_YELLOW, 'r': P_RED, 'p': P_PURPLE,
      'g': P_GREEN}
_TILES_TXT = (
    "QgB2 QgQ2 BgQ2 RpB2 BpQ2 QpQ2 QpB2 PrB2 QrQ2 QrB2 BrY2 QyQ2 ByP2 QyR2 "
    "GyB2 QbQ2 QbQ2 QbG2 RbY2 QbQ2 QPQ2 PQY2 BQB2 QYQ2 YQR2 RQB2 BQY2 YBP2 "
    "QGQ2 YBG2 RQP2 YQP2 RBG2 RQY2 PBR2 GQY2 YQR2 "
    "RgB3 QpQ3 BrQ3 QyQ3 YbP3 QBQ3 GQR3 BQY3 BQP3 YQB3 BQB3 RBY3 "
    "BgY4 YpB4 QrQ4 PyQ4 YbQ4 BQR4 PQB4 BQG4 QRQ4 RQB4 YQB4 BQB4")
TILES_DATA = np.array([[_T[w[0]], _T[w[1]], _T[w[2]], int(w[3])]
                       for w in _TILES_TXT.split()], np.int8)
assert TILES_DATA.shape == (61, 4)

# ---------------------------------------------------------------------------
# precomputed geometry (numpy, import time) — reference lines 184-231
# ---------------------------------------------------------------------------


def _build_neighbors():
    nb = np.full((CITY_AREA, 6), -1, np.int32)
    for r in range(CITY_SIZE):
        for q in range(CITY_SIZE):
            idx, cnt = r * CITY_SIZE + q, 0
            for dq, dr in (_DIR_ODD if r % 2 == 1 else _DIR_EVEN):
                nq, nr = q + dq, r + dr
                if 0 <= nq < CITY_SIZE and 0 <= nr < CITY_SIZE:
                    nb[idx, cnt] = nr * CITY_SIZE + nq
                    cnt += 1
    return nb


NEIGHBORS = _build_neighbors()
IS_BORDER = (NEIGHBORS < 0).any(axis=1)          # cell has an off-board side
IS_INTERIOR = ~IS_BORDER


def _build_patterns():
    pat = np.full((N_PATTERNS, 3), -1, np.int32)
    for s in range(CITY_AREA):
        r, q = divmod(s, CITY_SIZE)
        dirs = _DIR_ODD if r % 2 == 1 else _DIR_EVEN
        for o in range(N_ORIENTS):
            d1, d2 = dirs[o], dirs[(o + 1) % N_ORIENTS]
            pts = [(q + d1[0], r + d1[1]), (q, r), (q + d2[0], r + d2[1])]
            if all(0 <= qq < CITY_SIZE and 0 <= rr < CITY_SIZE
                   for qq, rr in pts):
                pat[s * N_ORIENTS + o] = [rr * CITY_SIZE + qq
                                          for qq, rr in pts]
    return pat


PATTERNS = _build_patterns()
PATTERN_OK = PATTERNS[:, 0] >= 0                 # fully on-board patterns


def _build_pattern_nei():
    pn = np.full((N_PATTERNS, 9), -1, np.int32)
    for p in range(N_PATTERNS):
        tri = set(PATTERNS[p])
        if -1 in tri:
            continue
        nbs = sorted({n for c in PATTERNS[p] for n in NEIGHBORS[c]
                      if n >= 0 and n not in tri})
        pn[p, :len(nbs)] = nbs
    return pn


PATTERN_NEI = _build_pattern_nei()


def _to_cube(idx):
    r, q = divmod(idx, CITY_SIZE)
    x = q - ((r - (r & 1)) // 2)
    return x, -x - r, r


_CX, _CY, _CZ = _to_cube(START_CELL)


def _rot_cell_center(idx, k):
    """Rotate cell k*60deg CW about the START tile; -1 if off-board."""
    x, y, z = _to_cube(idx)
    x, y, z = x - _CX, y - _CY, z - _CZ
    for _ in range(k):
        x, y, z = -z, -x, -y
    x, z = x + _CX, z + _CZ
    r2, q2 = z, x + ((z - (z & 1)) // 2)
    if 0 <= r2 < CITY_SIZE and 0 <= q2 < CITY_SIZE:
        return r2 * CITY_SIZE + q2
    return -1


def _build_rotations():
    cell_inv = np.full((N_ORIENTS, CITY_AREA), -1, np.int32)   # dst -> src
    pat_inv = np.full((N_ORIENTS, N_PATTERNS), -1, np.int32)
    pat_lut = {tuple(PATTERNS[j]): j for j in range(N_PATTERNS)
               if PATTERN_OK[j]}
    for k in range(N_ORIENTS):
        for src in range(CITY_AREA):
            dst = _rot_cell_center(src, k)
            if dst >= 0:
                cell_inv[k, dst] = src
        for p in range(N_PATTERNS):
            if not PATTERN_OK[p]:
                continue
            tri = tuple(_rot_cell_center(c, k) for c in PATTERNS[p])
            j = pat_lut.get(tri, -1)
            if j >= 0:
                pat_inv[k, j] = p
    return cell_inv, pat_inv


ROT_CELL_INV, ROT_PAT_INV = _build_rotations()

_BIT_W = np.array([128, 64, 32, 16, 8, 4, 2, 1], np.int32)


# ---------------------------------------------------------------------------


def _fixpoint(body, x0):
    """Iterate body until the array stops changing (bounded graph diameter)."""
    def cond(c):
        return c[1]

    def step(c):
        x, _ = c
        nx = body(x)
        return nx, jnp.any(nx != x)

    return jax.lax.while_loop(cond, step, (x0, jnp.bool_(True)))[0]


@dataclasses.dataclass(frozen=True)
class AkropolisMeta:
    num_players: int
    constr_site: int


def make_akropolis(num_players: int = 2) -> GameSpec:
    if num_players not in (2, 3, 4):
        raise ValueError("Akropolis supports 2-4 players")
    n = num_players
    cs_size = n + 2
    num_actions = cs_size * N_PATTERNS
    Z_SC, Z_GL = 3 * n, 3 * n + 1

    nb = jnp.asarray(NEIGHBORS)
    nbc = jnp.maximum(nb, 0)
    nb_ok = nb >= 0
    is_border = jnp.asarray(IS_BORDER)
    is_interior = jnp.asarray(IS_INTERIOR)
    patterns = jnp.asarray(PATTERNS)
    pattern_ok = jnp.asarray(PATTERN_OK)
    pat_nei = jnp.asarray(PATTERN_NEI)
    pat_nei_ok = pat_nei >= 0
    pat_neic = jnp.maximum(pat_nei, 0)
    tiles_data = jnp.asarray(TILES_DATA, jnp.int32)
    stars = jnp.asarray(PLAZA_STARS)
    descr_color = jnp.asarray(DESCR_COLOR)
    bit_w = jnp.asarray(_BIT_W)
    playable = jnp.asarray(TILES_DATA[:, 3].astype(np.int32) <= n)

    def _i32(s):
        return s.astype(jnp.int32)

    # -------- packed-scalar accessors (reference copy_state views, :297-312)

    def get_stones(s):                       # (n,) int32
        return _i32(s)[2 * n:3 * n, 1, Z_SC]

    def get_plazas(s):                       # (n, 5)
        return _i32(s)[:n, :N_COLORS, Z_SC]

    def get_districts(s):                    # (n, 5)
        return _i32(s)[n:2 * n, :N_COLORS, Z_SC]

    def get_cs(s):                           # (cs_size, 4)
        return _i32(s)[:cs_size, :4, Z_GL]

    def get_bitpack(s):                      # (8,) int32 (int8 bytes)
        return _i32(s)[cs_size, :8, Z_GL]

    def get_misc(s):                         # (2,) [round, stacks_left]
        return _i32(s)[cs_size + 1, :2, Z_GL]

    def unpack64(bytes_i32):
        """my_unpackbits (reference :87-93): MSB-first bits of 8 int8 bytes."""
        bits = (bytes_i32[:, None] & bit_w) > 0
        return bits.reshape(64)

    def pack64(bits):
        """my_packbits (reference :76-85): bools -> 8 int8 bytes."""
        pad = (-bits.shape[0]) % 8
        if pad:
            bits = jnp.concatenate([bits, jnp.zeros(pad, bits.dtype)])
        b = bits.reshape(8, 8).astype(jnp.int32)
        vals = jnp.sum(b * bit_w, axis=1)
        return jnp.where(vals > 127, vals - 256, vals).astype(jnp.int8)

    # -------- district scoring (reference _update_districts, :520-611) -----

    def compute_districts(descr, h):
        """descr, h: (169,) int32 -> (5,) int32 (BLUE..GREEN order)."""
        nb_descr = descr[nbc]
        nb_h = h[nbc]

        green = jnp.sum(h * (descr == D_GREEN))

        is_y = descr == D_YELLOW
        y_touch = jnp.any((nb_descr == D_YELLOW) & nb_ok, axis=1)
        yellow = jnp.sum(h * is_y * ~y_touch)

        surrounded = is_interior & jnp.all((nb_h > 0) | ~nb_ok, axis=1)
        purple = jnp.sum(h * (descr == D_PURPLE) * surrounded)

        is_empty = descr == EMPTY
        outer0 = is_empty & is_border

        def dilate(o):
            return o | (is_empty & jnp.any(o[nbc] & nb_ok, axis=1))

        outer = _fixpoint(dilate, outer0)
        red_touch = is_border | jnp.any(outer[nbc] & nb_ok, axis=1)
        red = jnp.sum(h * (descr == D_RED) * red_touch)

        is_b = descr == D_BLUE
        lab0 = jnp.where(is_b, jnp.arange(CITY_AREA), CITY_AREA)

        def propagate(lab):
            ln = jnp.where(nb_ok & is_b[nbc], lab[nbc], CITY_AREA)
            return jnp.where(is_b, jnp.minimum(lab, jnp.min(ln, axis=1)),
                             CITY_AREA)

        lab = _fixpoint(propagate, lab0)
        comp = jax.ops.segment_sum(h * is_b, lab, num_segments=CITY_AREA + 1)
        blue = jnp.max(comp.at[CITY_AREA].set(0))

        return jnp.stack([blue, yellow, red, purple, green])

    def encode_score(total):
        return (total // 2 - 128).astype(jnp.int8)   # reference :239-247

    # -------- construction-site refill (the chance node, :503-518) ---------

    def draw_tiles(state, key, seed, start_slot: int):
        """Fill slots start_slot..cs_size-1 from the tile-deck bitfield.
        seed != 0: reference LCG, one rnd for the whole refill; seed == 0:
        uniform PRNG draw per slot."""
        avail = unpack64(get_bitpack(state))
        rnd = jnp.mod(2014 * (seed + get_misc(state)[0]) + 42, 61)
        for i in range(start_slot, cs_size):
            count = jnp.maximum(jnp.sum(avail), 1)
            k_rank = jax.random.randint(jax.random.fold_in(key, i), (),
                                        0, count)
            rank = jnp.where(seed == 0, k_rank, rnd % count)
            csum = jnp.cumsum(avail)
            tile_id = jnp.argmax(avail & (csum == rank + 1))
            tile = tiles_data[tile_id]
            state = state.at[i, :3, Z_GL].set(tile[:3].astype(jnp.int8))
            state = state.at[i, 3, Z_GL].set(tile_id.astype(jnp.int8))
            avail = avail.at[tile_id].set(False)
        packed = pack64(avail)
        return state.at[cs_size, :8, Z_GL].set(packed)

    # -------- GameSpec functions -------------------------------------------

    def valids(state):
        s = _i32(state)
        h = s[:, :, n].reshape(CITY_AREA)          # player 0 heights
        tid = s[:, :, 2 * n].reshape(CITY_AREA)    # player 0 tile ids

        cellh = h[jnp.maximum(patterns, 0)]        # (NP, 3)
        same_h = (cellh[:, 0] == cellh[:, 1]) & (cellh[:, 0] == cellh[:, 2])
        on_ground = cellh[:, 0] == 0
        connected = jnp.any((h[pat_neic] > 0) & pat_nei_ok, axis=1)
        celltid = tid[jnp.maximum(patterns, 0)]
        same_tile = (celltid[:, 0] == celltid[:, 1]) & \
                    (celltid[:, 0] == celltid[:, 2])
        pvalid = pattern_ok & same_h & jnp.where(on_ground, connected,
                                                 ~same_tile)

        stones0 = get_stones(s)[0]
        slots = jnp.arange(cs_size)
        slot_ok = (slots <= stones0) & (get_cs(s)[:, 0] != EMPTY)
        return (slot_ok[:, None] & pvalid[None, :]).reshape(num_actions)

    def step(state, action, key, seed):
        """reference make_move (:314-352); operates on canonical player 0."""
        action = jnp.asarray(action, jnp.int32)
        seed = jnp.asarray(seed, jnp.int32)
        s = _i32(state)
        slot = action // N_PATTERNS
        pat = action % N_PATTERNS

        tile = get_cs(s)[jnp.minimum(slot, cs_size - 1)]         # (4,)
        # shift construction site left past the taken slot
        idx = jnp.arange(cs_size)
        src = jnp.minimum(idx + (idx >= slot), cs_size - 1)
        shifted = get_cs(s)[src]
        shifted = shifted.at[cs_size - 1].set(EMPTY)
        state = state.at[:cs_size, :4, Z_GL].set(shifted.astype(jnp.int8))

        cells = patterns[pat]                                    # (3,)
        rr, qq = cells // CITY_SIZE, cells % CITY_SIZE
        under = s[rr, qq, 0]                                     # descr P0
        under_plaza = (under >= P_BLUE)
        # covered plazas lose their star; covered quarries yield a stone
        plaza_delta = jax.ops.segment_sum(
            -under_plaza.astype(jnp.int32), descr_color[under],
            num_segments=N_COLORS)
        stones_gain = jnp.sum(under == QUARRY)

        descs = tile[:3]
        state = state.at[rr, qq, 0].set(descs.astype(jnp.int8))
        state = state.at[rr, qq, n].add(jnp.ones(3, jnp.int8))
        state = state.at[rr, qq, 2 * n].set(
            jnp.full(3, tile[3], jnp.int8))
        plaza_delta = plaza_delta + jax.ops.segment_sum(
            (descs >= P_BLUE).astype(jnp.int32), descr_color[descs],
            num_segments=N_COLORS)
        new_plazas = get_plazas(_i32(state))[0] + plaza_delta
        state = state.at[0, :N_COLORS, Z_SC].set(new_plazas.astype(jnp.int8))

        new_stones = get_stones(_i32(state))[0] + stones_gain - slot
        state = state.at[2 * n, 1, Z_SC].set(new_stones.astype(jnp.int8))

        s2 = _i32(state)
        descr = s2[:, :, 0].reshape(CITY_AREA)
        hgt = s2[:, :, n].reshape(CITY_AREA)
        dist = compute_districts(descr, hgt)
        state = state.at[n, :N_COLORS, Z_SC].set(dist.astype(jnp.int8))
        total = jnp.sum(dist * new_plazas * stars) + new_stones
        state = state.at[2 * n, 0, Z_SC].set(encode_score(total))

        state = state.at[cs_size + 1, 0, Z_GL].add(1)            # round

        s3 = _i32(state)
        need_draw = (get_cs(s3)[1, 0] == EMPTY) & (get_misc(s3)[1] > 0)
        state = jax.lax.cond(
            need_draw,
            lambda st: draw_tiles(st, key, seed, 1)
            .at[cs_size + 1, 1, Z_GL].add(-1),
            lambda st: st, state)
        return state, jnp.int32(1)

    def canonical(state, swap):
        k = swap % n
        zs = jnp.arange(n)
        src = (zs + k) % n
        st = state
        st = st.at[:, :, 0:n].set(state[:, :, src])
        st = st.at[:, :, n:2 * n].set(state[:, :, n + src])
        st = st.at[:, :, 2 * n:3 * n].set(state[:, :, 2 * n + src])
        st = st.at[0:n, :, Z_SC].set(state[src, :, Z_SC])
        st = st.at[n:2 * n, :, Z_SC].set(state[n + src, :, Z_SC])
        st = st.at[2 * n:3 * n, :, Z_SC].set(state[2 * n + src, :, Z_SC])
        return jnp.where(k == 0, state, st)

    def terminal(state):
        """reference check_end_game (:426-435); tie-break by stones."""
        s = _i32(state)
        ended = (get_misc(s)[1] <= 0) & (get_cs(s)[1, 0] == EMPTY)
        stones = get_stones(s)
        dscore = jnp.sum(get_districts(s) * get_plazas(s) * stars, axis=1)
        proxy = (dscore + stones) * 1000 + stones
        m = jnp.max(proxy)
        single = jnp.sum(proxy == m) == 1
        res = jnp.where(proxy == m, jnp.where(single, 1.0, 0.001), -1.0)
        return jnp.where(ended, res, 0.0).astype(jnp.float32)

    def get_score(state, player):
        s = _i32(state)
        sc = jnp.sum(get_districts(s) * get_plazas(s) * stars, axis=1) \
            + get_stones(s)
        return sc[player].astype(jnp.float32)

    def get_round(state):
        return get_misc(_i32(state))[0]

    def init(key):
        state = jnp.zeros((CITY_SIZE, CITY_SIZE, 3 * n + 2), jnp.int8)
        stones0 = jnp.arange(1, n + 1, dtype=jnp.int32)
        state = state.at[2 * n:3 * n, 1, Z_SC].set(stones0.astype(jnp.int8))
        state = state.at[2 * n:3 * n, 0, Z_SC].set(encode_score(stones0))
        state = state.at[cs_size, :8, Z_GL].set(pack64(playable))
        state = state.at[cs_size + 1, 1, Z_GL].set(N_STACKS)
        # start tile: blue plaza at center + 3 quarries (reference :282-290)
        start_id = np.int8(TILES_DATA.shape[0])
        state = state.at[START_R, START_Q, 0:n].set(P_BLUE)
        state = state.at[START_R, START_Q, n:2 * n].set(1)
        state = state.at[START_R, START_Q, 2 * n:3 * n].set(start_id)
        state = state.at[:n, BLUE, Z_SC].set(1)
        for cell in NEIGHBORS[START_CELL, ::2]:
            r0, q0 = divmod(int(cell), CITY_SIZE)
            state = state.at[r0, q0, 0:n].set(QUARRY)
            state = state.at[r0, q0, n:2 * n].set(1)
            state = state.at[r0, q0, 2 * n:3 * n].set(start_id)
        return draw_tiles(state, key, jnp.int32(0), 0)

    def observe(state):
        return state.astype(jnp.float32)

    rot_cell_inv = jnp.asarray(ROT_CELL_INV)    # (6, 169) dst <- src
    rot_pat_inv = jnp.asarray(ROT_PAT_INV)      # (6, 1014)

    def symmetries(state, pi, valid):
        flat = state.reshape(CITY_AREA, 3 * n + 2)

        def one(k):
            src = rot_cell_inv[k]
            cells = jnp.where((src >= 0)[:, None],
                              flat[jnp.maximum(src, 0)], 0)
            st = cells.reshape(CITY_SIZE, CITY_SIZE, 3 * n + 2)
            # scalar planes are not geometric — keep them as-is
            st = st.at[:, :, Z_SC:].set(state[:, :, Z_SC:])
            psrc = rot_pat_inv[k]                     # (1014,)
            gather = jnp.maximum(psrc, 0)
            ok = psrc >= 0
            pi2 = pi.reshape(cs_size, N_PATTERNS)
            va2 = valid.reshape(cs_size, N_PATTERNS)
            new_pi = jnp.where(ok[None, :], pi2[:, gather], 0.0)
            new_va = jnp.where(ok[None, :], va2[:, gather], False)
            # the 13x13 rhombus only contains the radius-6 hex disk: content
            # beyond it rotates off-board.  If any OCCUPIED cell would drop,
            # the rotation corrupts the city — fall back to the identity.
            # Fringe placements (valid actions) that drop merely shrink the
            # rotated mask; renormalize pi over the surviving actions.
            city_ok = (jnp.sum(st[:, :, n:2 * n].astype(jnp.int32))
                       == jnp.sum(state[:, :, n:2 * n].astype(jnp.int32)))
            new_pi = new_pi.reshape(num_actions)
            new_pi = new_pi / jnp.maximum(jnp.sum(new_pi), 1e-9)
            return (jnp.where(city_ok, st, state),
                    jnp.where(city_ok, new_pi, pi),
                    jnp.where(city_ok, new_va.reshape(num_actions), valid))

        return jax.vmap(one)(jnp.arange(N_ORIENTS))

    return GameSpec(
        name=f"akropolis_{n}p",
        num_players=n,
        state_shape=(CITY_SIZE, CITY_SIZE, 3 * n + 2),
        obs_shape=(CITY_SIZE, CITY_SIZE, 3 * n + 2),
        num_actions=num_actions,
        max_game_length=12 * n + 16,
        init=init,
        valids=valids,
        step=step,
        canonical=canonical,
        terminal=terminal,
        observe=observe,
        get_round=get_round,
        get_score=get_score,
        symmetries=symmetries,
        num_symmetries=N_ORIENTS,
        meta=AkropolisMeta(num_players=n, constr_site=cs_size),
    )
