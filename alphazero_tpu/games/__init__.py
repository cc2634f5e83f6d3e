"""Game registry — maps CLI names to GameSpec factories.

TPU-native analog of the reference's GameSwitcher (/root/reference/GameSwitcher.py:3-35),
with game variants expressed as factory kwargs instead of module-constant edits.
"""

from __future__ import annotations

from typing import Callable, Dict

from alphazero_tpu.games.base import GameSpec, roll_returns
from alphazero_tpu.games.santorini import make_santorini
from alphazero_tpu.games.splendor import make_splendor
from alphazero_tpu.games.azul import make_azul
from alphazero_tpu.games.abalone import make_abalone
from alphazero_tpu.games.minivilles import make_minivilles
from alphazero_tpu.games.tlp import make_tlp
from alphazero_tpu.games.akropolis import make_akropolis
from alphazero_tpu.games.botanik import make_botanik
from alphazero_tpu.games.smallworld import make_smallworld

GAME_REGISTRY: Dict[str, Callable[..., GameSpec]] = {
    "santorini": make_santorini,
    "splendor": make_splendor,
    "azul": make_azul,
    "abalone": make_abalone,
    "minivilles": make_minivilles,
    "thelittleprince": make_tlp,
    "akropolis": make_akropolis,
    "botanik": make_botanik,
    "smallworld": make_smallworld,
}


_SPEC_CACHE: Dict[tuple, GameSpec] = {}


def make_game(name: str, **kwargs) -> GameSpec:
    """Build (or reuse) a GameSpec.

    Memoized: a GameSpec holds fresh function closures, and jit caches key on
    object identity — without memoization every caller (each pit player,
    each PBT population member, ...) would recompile the entire self-play/
    search/train program set for an identical game.
    """
    if name not in GAME_REGISTRY:
        raise KeyError(f"unknown game {name!r}; known: {sorted(GAME_REGISTRY)}")
    key = (name, tuple(sorted(kwargs.items())))
    if key not in _SPEC_CACHE:
        _SPEC_CACHE[key] = GAME_REGISTRY[name](**kwargs)
    return _SPEC_CACHE[key]


__all__ = ["GameSpec", "GAME_REGISTRY", "make_game", "make_santorini",
           "roll_returns"]
