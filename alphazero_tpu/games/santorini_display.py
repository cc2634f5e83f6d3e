"""Santorini rendering + human-readable moves.

Role of the reference's SantoriniDisplay.py (print_board / move_to_str) —
original ASCII rendering, not a copy.
"""

from __future__ import annotations

import numpy as np

DIR_NAMES = ["NW", "N", "NE", "W", "·", "E", "SW", "S", "SE"]
GOD_NAMES = ["", "Apollo", "Minotaur", "Atlas", "Hephaestus", "Artemis",
             "Demeter", "Hermes", "Pan", "Athena", "Prometheus"]


def move_to_str(action: int, nb_gods: int = 1) -> str:
    rest = action % (nb_gods * 81)
    w = action // (nb_gods * 81)
    god, rest2 = divmod(rest, 81)
    m, b = divmod(rest2, 9)
    s = f"worker {w + 1} moves {DIR_NAMES[m]}"
    if b != 4:
        s += f", builds {DIR_NAMES[b]}"
    if god and god < len(GOD_NAMES):
        s += f" [{GOD_NAMES[god]}]"
    return s


def board_to_str(state) -> str:
    """5x5 grid; each cell shows level (0-4, # = dome) and worker
    (A/B = current player, a/b = opponent)."""
    st = np.asarray(state)
    workers, levels = st[:, :, 0].astype(int), st[:, :, 1].astype(int)
    sym = {1: "A", 2: "B", -1: "a", -2: "b", 0: " "}
    rows = ["    " + "   ".join(str(c) for c in range(5))]
    for y in range(5):
        cells = []
        for x in range(5):
            lvl = "#" if levels[y, x] >= 4 else str(levels[y, x])
            cells.append(f"{lvl}{sym.get(workers[y, x], '?')}")
        rows.append(f"{y}  " + "  ".join(cells))
    rnd = int(st[:, :, 2].reshape(-1)[2])
    rows.append(f"round {rnd}")
    return "\n".join(rows)


def print_board(state):
    print(board_to_str(state))
