"""play_matches_vs_host: batched device-MCTS lanes vs a host-side scripted
player (the seam used for the Akropolis Undefeated-Strategy bot matches,
reference AkropolisPlayers.py:350-497 / Arena.py:35-101).

Uses Santorini + a host random-legal player so the fast tier covers the
lockstep lane/seat/result bookkeeping without akropolis-size compiles.
"""

import jax
import numpy as np
import pytest

from alphazero_tpu.config import MCTSConfig, NetConfig
from alphazero_tpu.games import make_game
from alphazero_tpu.models import init_params, make_net
from alphazero_tpu.players import play_matches_vs_host


@pytest.mark.slow
def test_hybrid_arena_completes_and_counts():
    spec = make_game("santorini", nb_gods=1, init_method=1)
    net = make_net(spec, NetConfig(version=0, channels=32, depth=1))
    params = init_params(net, spec, jax.random.PRNGKey(0))
    valids_f = jax.jit(spec.valids)

    consulted = []

    def make_player():
        def play(state, key, t):
            v = np.asarray(valids_f(state))
            opts = np.flatnonzero(v)
            assert opts.size, "host player consulted on a dead state"
            consulted.append(t)
            return int(opts[int(jax.random.randint(key, (), 0, opts.size))])
        return play

    cfg = MCTSConfig(num_sims=8)
    res = play_matches_vs_host(spec, net, params, make_player,
                               jax.random.PRNGKey(1), cfg=cfg, num_games=6)
    total = res.one_wins + res.two_wins + res.draws + res.unfinished
    assert total == 6
    assert res.unfinished == 0          # santorini always terminates
    assert consulted, "host player was never consulted"
