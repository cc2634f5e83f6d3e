"""The Akropolis "Undefeated Strategy" bot vs the reference implementation.

The reference bot (akropolis/AkropolisPlayers.py:350-497) is the published
external baseline (README.md:80-86).  We compare rule-cascade decisions
(candidate action sets + categories) move-by-move on a shared game, then
check the bot crushes a random player.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alphazero_tpu.games import make_game
from alphazero_tpu.games.akropolis_bot import (ALL_UNIVERSES, N_UNIVERSES,
                                               UndefeatedPlayer)
from alphazero_tpu.players import play_host_game, random_player
from tests.reference_oracle import install_numba_stub, REFERENCE_PATH


def test_universe_tables():
    assert N_UNIVERSES == 8
    # every universe: 5 levels of 5,4,3,2,1 tiles above the empty level
    for u in ALL_UNIVERSES.values():
        assert [len(lvl) for lvl in u] == [0, 5, 4, 3, 2, 1]


def test_decisions_match_reference():
    import sys
    install_numba_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    for m in list(sys.modules):
        if m.startswith("akropolis"):
            del sys.modules[m]
    import akropolis.AkropolisPlayers as RP
    from akropolis.AkropolisGame import AkropolisGame

    np.random.seed(2)
    game = AkropolisGame()
    state = np.array(game.board.get_state(), copy=True)
    spec = make_game("akropolis", num_players=2)

    ref_bots = [RP.GreedyPlayer(game), RP.GreedyPlayer(game)]
    our_bots = [UndefeatedPlayer(spec), UndefeatedPlayer(spec)]
    step_f = jax.jit(lambda s, a: spec.step_canonical(
        s, jnp.asarray(a, jnp.int32), jax.random.PRNGKey(0), jnp.int32(42)))

    seat = 0
    for ply in range(14):
        game.board.copy_state(state.copy(), False)
        rb, ob = ref_bots[seat], our_bots[seat]
        if int(game.board.misc[0]) < 2:
            rb.possible_universes = list(range(RP.n_universes))
            ob.possible_universes = list(range(N_UNIVERSES))
        ref_actions, ref_cat = rb._categorize(state)
        our_actions, our_cat = ob.categorize(jnp.asarray(state))
        assert our_cat == ref_cat, f"ply {ply}: category {our_cat}!={ref_cat}"
        assert sorted(our_actions) == sorted(ref_actions), f"ply {ply}"

        our_filtered = ob.score_filter(jnp.asarray(state), our_actions)
        action = min(our_filtered)
        game.board.copy_state(state.copy(), False)
        rb._update_possible_universes(action, ref_cat)
        ob.observe_move(jnp.asarray(state), action)
        assert ob.possible_universes == rb.possible_universes, f"ply {ply}"

        game.board.copy_state(state.copy(), True)
        nxt = game.board.make_move(action, 0, random_seed=42)
        game.board.swap_players(nxt)
        st, _ = step_f(jnp.asarray(state), action)
        state = np.asarray(st)
        np.testing.assert_array_equal(state, game.board.get_state())
        seat = 1 - seat


def test_undefeated_beats_random():
    spec = make_game("akropolis", num_players=2)
    bot = UndefeatedPlayer(spec)
    result, _ = play_host_game(spec, [bot, random_player(spec)],
                               jax.random.PRNGKey(100))
    assert result[0] > 0.5, "the Undefeated Strategy lost to uniform random"
