"""GameSpec — the pure-functional game contract.

This is the TPU-native reshaping of the reference's 14-method ``Game`` ABC
(/root/reference/Game.py:1-163) and per-game Numba ``Board`` jitclasses
(e.g. /root/reference/santorini/SantoriniLogicNumba.py:79-729).

Design rules (so every game is jit/vmap/scan friendly):

- A game *state* is a single fixed-shape integer array (usually int8), always
  stored in **canonical form**: player 0 of the state is the player to move.
  (The reference keeps a non-canonical board plus ``getCanonicalForm``; we
  keep the canonical invariant instead and track the absolute player index
  separately where needed.)
- All functions are pure, take/return arrays only, and have static shapes.
  Batch execution is ``jax.vmap``; there is no Python-level per-board loop.
- ``step`` returns the *relative* player shift ``swap`` (the reference's
  ``make_move`` return value, /root/reference/Game.py:36-49): ``swap == 0``
  means the same player moves again (play-again gods, multi-action turns).
- Chance is driven by two channels, mirroring the reference's convention
  (/root/reference/Game.py:42-44): a JAX PRNG key for "true random" play and
  an int32 ``seed`` for the deterministic per-universe LCG used during search
  (seed <= 0 selects the PRNG-key path).
- ``terminal`` returns the per-player result vector in the canonical frame
  (index 0 = player to move), matching ``check_end_game(next_player=0)`` on a
  canonical board as used by the reference MCTS (/root/reference/MCTS.py:131).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
State = jax.Array  # canonical game state


@dataclasses.dataclass(frozen=True)
class GameSpec:
    """A complete, pure-functional description of one game (one variant).

    Function signatures (single state; callers vmap):
      init:        (key)                      -> state
      valids:      (state)                    -> (A,) bool, moves of player 0
      step:        (state, action, key, seed) -> (state', swap:int32)
                   state' is NOT yet canonicalized; swap is the relative
                   player shift (0 = same player plays again).
      canonical:   (state, swap)              -> state, applies player swap
      terminal:    (state)                    -> (P,) float32 result vector in
                   canonical frame; all-zero means the game continues.
      observe:     (state)                    -> float32 NN observation
      get_round:   (state)                    -> int32 round counter
      get_score:   (state, player)            -> float32 score of player index
                   (in the state's canonical frame)
      symmetries:  (state, pi, valids)        -> (S,*state), (S,A), (S,A)
                   stacked symmetric variants (S = num_symmetries), first
                   entry is the identity.
    """

    name: str
    num_players: int
    state_shape: Tuple[int, ...]
    obs_shape: Tuple[int, ...]
    num_actions: int
    max_game_length: int

    init: Callable[[Array], State]
    valids: Callable[[State], Array]
    step: Callable[[State, Array, Array, Array], Tuple[State, Array]]
    canonical: Callable[[State, Array], State]
    terminal: Callable[[State], Array]
    observe: Callable[[State], Array]
    get_round: Callable[[State], Array]
    get_score: Callable[[State, Array], Array]
    symmetries: Optional[Callable[[State, Array, Array], Tuple[Array, Array, Array]]]
    num_symmetries: int = 1

    # Largest self-play scan length (move slots per device program) known
    # safe on the TPU worker for this engine; 0 = no known limit (full
    # max_game_length scans are fine).  Some engines fault the worker in
    # long scans (docs/tpu_limits.md, measured via
    # scripts/tpu_scan_bisect.py); the Coach auto-chunks to this length on
    # TPU backends instead of crashing.
    safe_scan_moves: int = 0

    # Simulation count at which safe_scan_moves was measured (0 = not
    # sims-sensitive).  The fault threshold tracks whole-program size, so
    # it SHRINKS as sims grow: splendor's 8-move chunk is safe at sims=100
    # but faults at sims=200, where only 1-move programs pass
    # (docs/tpu_limits.md).  The Coach clamps the auto-chunk to 1 whenever
    # cfg.mcts.num_sims exceeds this measured point.
    safe_scan_sims: int = 0

    # Free-form static metadata (variant flags etc.), never traced.
    meta: Any = None

    def step_canonical(self, state: State, action: Array, key: Array,
                       seed: Array) -> Tuple[State, Array]:
        """step + canonicalize, fused — the reference MCTS's
        ``make_move`` + ``swap_players`` pair (/root/reference/MCTS.py:233-248)."""
        nxt, swap = self.step(state, action, key, seed)
        return self.canonical(nxt, swap), swap

    def terminal_any(self, state: State) -> Array:
        """True if the game has ended (reference: ``getGameEnded(...).any()``)."""
        return jnp.any(self.terminal(state) != 0)


def roll_returns(values: Array, shift: Array) -> Array:
    """np.roll for per-player return vectors with a traced shift.

    Reference semantics: ``np_roll(v, next_player)`` converts a child-frame
    value vector into the parent frame (/root/reference/MCTS.py:175-176,205-207).
    """
    return jnp.roll(values, shift, axis=-1)
