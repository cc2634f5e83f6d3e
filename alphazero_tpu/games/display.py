"""Per-game presentation: move_to_str + board rendering.

TPU-native analog of the reference's per-game Display/Logic modules
(e.g. /root/reference/santorini/SantoriniDisplay.py,
splendor/SplendorLogic.py:399+, smallworld/SmallworldDisplay.py): a registry
keyed by the GameSpec's base name providing ``move_to_str(spec, action)`` for
human players / logs and ``render(spec, state) -> str`` for Arena verbose
mode.  Renders are compact text (no ANSI art) — they exist to make games
playable and debuggable, not pretty.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

_DIR9 = ["NW", "N", "NE", "W", ".", "E", "SW", "S", "SE"]
_GEM_LETTERS = "wbgrk"  # white blue green red black (+ gold)


def _base_name(spec) -> str:
    return spec.name.split("_")[0]


# ---------------------------------------------------------------------------
# move_to_str
# ---------------------------------------------------------------------------

def _mts_santorini(spec, a: int) -> str:
    nb_gods = spec.num_actions // (2 * 81)
    worker, rest = divmod(a, nb_gods * 81)
    god, rest = divmod(rest, 81)
    mv, bd = divmod(rest, 9)
    s = f"W{worker + 1} move {_DIR9[mv]} build {_DIR9[bd]}"
    return s + (f" (god {god})" if nb_gods > 1 else "")


def _mts_splendor(spec, a: int) -> str:
    from alphazero_tpu.games.splendor_data import GEMS_UP_TO_2, GEMS_UP_TO_3

    def gems(v):
        return "".join(_GEM_LETTERS[i] * int(v[i]) for i in range(5))

    if a < 12:
        return f"buy card tier{a // 4 + 1} pos{a % 4}"
    if a < 24:
        i = a - 12
        return f"reserve card tier{i // 4 + 1} pos{i % 4}"
    if a < 27:
        return f"reserve from deck tier{a - 24 + 1}"
    if a < 30:
        return f"buy reserved card {a - 27}"
    if a < 55:
        return f"take gems {gems(GEMS_UP_TO_3[a - 30])}"
    if a < 60:
        return f"take 2 {_GEM_LETTERS[a - 55]}"
    if a < 75:
        return f"give gems {gems(GEMS_UP_TO_2[a - 60])}"
    if a < 80:
        return f"give 2 {_GEM_LETTERS[a - 75]}"
    return "pass"


def _mts_azul(spec, a: int) -> str:
    fac, rest = divmod(a, 30)
    color, line = divmod(rest, 6)
    src = "centre" if fac == 0 else f"factory {fac}"
    dst = "floor" if line == 5 else f"line {line + 1}"
    return f"take color {color} from {src} to {dst}"


def _mts_abalone(spec, a: int) -> str:
    cell, plane = divmod(a, 42)
    r, q = divmod(cell, 9)
    if plane < 6:
        return f"move 1 from ({r},{q}) dir {plane}"
    if plane < 24:
        axis, d = divmod(plane - 6, 6)
        return f"move 2 at ({r},{q}) axis {axis} dir {d}"
    axis, d = divmod(plane - 24, 6)
    return f"move 3 at ({r},{q}) axis {axis} dir {d}"


_MINIVILLES_CARDS = [
    "Wheat Field", "Ranch", "Bakery", "Cafe", "Convenience Store", "Forest",
    "Stadium", "Business Center", "TV Station", "Cheese Factory",
    "Furniture Factory", "Mine", "Restaurant", "Orchard", "Market"]
_MINIVILLES_MONU = ["Train Station", "Shopping Mall", "Amusement Park",
                    "Radio Tower"]


def _mts_minivilles(spec, a: int) -> str:
    if a < 15:
        return f"buy {_MINIVILLES_CARDS[a]}"
    if a < 19:
        return f"build {_MINIVILLES_MONU[a - 15]}"
    if a == 19:
        return "reroll dice"
    return "pass"


def _mts_tlp(spec, a: int) -> str:
    n = spec.num_players
    card, delta = divmod(a, n)
    return f"take market card {card}, next player +{delta}"


def _mts_botanik(spec, a: int) -> str:
    if a < 15:
        return f"arrival card {a // 5} -> register slot {a % 5}"
    if a < 30:
        i = a - 15
        return f"arrival card {i // 5} -> middle slot {i % 5}"
    if a < 35:
        return f"swap mecabot with middle slot {a - 30}"
    if a < spec.num_actions - 1:
        i = a - 35
        card, rest = divmod(i, 4 * 49)
        cell, orient = divmod(rest, 4)
        return f"freed card {card} -> machine ({cell // 7},{cell % 7}) " \
               f"rot {orient * 90}"
    return "throw freed cards away"


def _mts_akropolis(spec, a: int) -> str:
    slot, rest = divmod(a, 13 * 13 * 6)
    cell, orient = divmod(rest, 6)
    return f"tile slot {slot} -> ({cell // 13},{cell % 13}) orient {orient}"


_SW_FAMS = ["abandon", "attack", "special(people)", "special(power)"]


def _mts_smallworld(spec, a: int) -> str:
    A = spec.meta.nb_areas
    if a < 4 * A:
        return f"{_SW_FAMS[a // A]} area {a % A}"
    a -= 4 * A
    if a < 8:
        return "skip redeploy" if a == 0 else f"redeploy {a} on each area"
    if a < 8 + A:
        return f"redeploy 1 on area {a - 8}"
    a -= 8 + A
    if a < 6:
        return f"choose deck combo {a}"
    return "decline" if a == 6 else "end turn"


_MTS: Dict[str, Callable] = {
    "santorini": _mts_santorini, "splendor": _mts_splendor,
    "azul": _mts_azul, "abalone": _mts_abalone,
    "minivilles": _mts_minivilles, "thelittleprince": _mts_tlp,
    "tlp": _mts_tlp, "botanik": _mts_botanik, "akropolis": _mts_akropolis,
    "smallworld": _mts_smallworld,
}


def move_to_str(spec, action: int) -> str:
    fn = _MTS.get(_base_name(spec))
    if fn is None:
        return f"action {action}"
    return fn(spec, int(action))


# ---------------------------------------------------------------------------
# render
# ---------------------------------------------------------------------------

def _render_santorini(spec, s) -> str:
    lines = []
    for r in range(5):
        row = []
        for q in range(5):
            w, lvl = int(s[r, q, 0]), int(s[r, q, 1])
            sym = {1: "A", 2: "B", -1: "a", -2: "b"}.get(w, ".")
            row.append(f"{sym}{lvl}")
        lines.append(" ".join(row))
    return "\n".join(lines)


def _render_abalone(spec, s) -> str:
    lines = []
    for r in range(9):
        cells = []
        for q in range(9):
            if not s[r, q, 2]:
                cells.append(" ")
            elif s[r, q, 0]:
                cells.append("o")
            elif s[r, q, 1]:
                cells.append("x")
            else:
                cells.append(".")
        lines.append(" " * r + " ".join(cells))
    lines.append(f"scores: {int(s[0, 0, 3])} - {int(s[0, 1, 3])}")
    return "\n".join(lines)


def _render_akropolis(spec, s) -> str:
    n = spec.num_players
    lines = []
    for p in range(n):
        rows = []
        for r in range(13):
            row = "".join(
                f"{int(s[r, q, p]):2d}" if s[r, q, n + p] else " ."
                for q in range(13))
            rows.append(row)
        lines.append(f"player {p} city (descr codes):\n" + "\n".join(rows))
    stones = [int(s[2 * n + p, 1, 3 * n]) for p in range(n)]
    lines.append(f"stones: {stones}")
    return "\n".join(lines)


def _render_smallworld(spec, s) -> str:
    A = spec.meta.nb_areas
    n = spec.num_players
    lines = ["area: nb type pwr def pts owner"]
    for a in range(A):
        t = s[a]
        if t[1] != 0:
            lines.append(f"  {a:2d}: {int(t[0]):2d} {int(t[1]):3d} "
                         f"{int(t[2]):3d} {int(t[5]):3d} {int(t[6]):3d} "
                         f"{int(t[7]):2d}")
    gs = A + 3 * n + 6 + n
    scores = [int(s[gs + p, 6]) + 128 for p in range(n)]
    lines.append(f"scores: {scores}")
    return "\n".join(lines)


def _render_rows(spec, s) -> str:
    """Generic fallback: non-zero state rows as integer vectors."""
    lines = []
    arr = np.asarray(s).reshape(s.shape[0], -1)
    for i, row in enumerate(arr):
        if np.any(row != 0):
            lines.append(f"{i:3d}: {row.tolist()}")
    return "\n".join(lines)


_RENDER: Dict[str, Callable] = {
    "santorini": _render_santorini,
    "abalone": _render_abalone,
    "akropolis": _render_akropolis,
    "smallworld": _render_smallworld,
}


def render(spec, state) -> str:
    s = np.asarray(state)
    fn = _RENDER.get(_base_name(spec), _render_rows)
    return fn(spec, s)
