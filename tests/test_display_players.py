"""Presentation layer: move_to_str coverage, renders, and player sanity.

Mirrors the reference's per-game Players/Display modules (SURVEY.md §2.4):
every action of every game must stringify, boards must render, and the
generic greedy player must beat uniform random where a 1-ply score heuristic
is meaningful.
"""

import os
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alphazero_tpu.games import GAME_REGISTRY, make_game
from alphazero_tpu.games.display import move_to_str, render
from alphazero_tpu.players import (greedy_player, play_greedy_vs_random,
                                   play_host_game, random_player)

ALL_GAMES = sorted(GAME_REGISTRY)


@pytest.mark.parametrize("name", ALL_GAMES)
def test_move_to_str_covers_all_actions(name):
    spec = make_game(name)
    seen = set()
    for a in range(spec.num_actions):
        s = move_to_str(spec, a)
        assert isinstance(s, str) and s
        seen.add(s)
    # strings must be informative: most actions get distinct labels
    assert len(seen) > spec.num_actions // 2


@pytest.mark.parametrize("name", ALL_GAMES)
def test_render(name):
    spec = make_game(name)
    state = spec.init(jax.random.PRNGKey(0))
    out = render(spec, state)
    assert isinstance(out, str) and len(out) > 10


def test_universe_step_int32_all_games():
    """TPU runs with x64 disabled (the test harness enables it for parity
    math): every engine must trace a universe-seeded step in pure int32 —
    constants that only fit in int64 would raise OverflowError.  Runs in a
    subprocess because x64 is a process-global setting."""
    import subprocess
    import sys
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np, jax.numpy as jnp\n"
        "from alphazero_tpu.games import make_game, GAME_REGISTRY\n"
        "for name in sorted(GAME_REGISTRY):\n"
        "    spec = make_game(name)\n"
        "    st = spec.init(jax.random.PRNGKey(0))\n"
        "    v = np.asarray(spec.valids(st))\n"
        "    a = jnp.int32(int(np.flatnonzero(v)[0]))\n"
        "    jax.jit(lambda s, a: spec.step_canonical(\n"
        "        s, a, jax.random.PRNGKey(1), jnp.int32(31416)))(st, a)\n"
        "print('OK')\n")
    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, timeout=900)
    assert out.returncode == 0 and "OK" in out.stdout, out.stderr[-2000:]


def test_host_game_random_vs_random():
    spec = make_game("santorini", nb_gods=1, init_method=1)
    players = [random_player(spec), random_player(spec)]
    result, moves = play_host_game(spec, players, jax.random.PRNGKey(0))
    assert result.shape == (2,)
    assert np.any(result != 0)
    assert moves < spec.max_game_length


def test_greedy_beats_random_abalone():
    """Abalone's score = marbles pushed off: a 1-ply greedy must dominate
    uniform random (the reference ships greedy baselines for this purpose,
    e.g. abalone/AbalonePlayers.py)."""
    spec = make_game("abalone")
    g, r, d, u = play_greedy_vs_random(
        spec, jax.random.PRNGKey(1), num_games=8)
    g, r = int(g), int(r)
    assert g + r + int(d) + int(u) == 8
    assert g > r, f"greedy {g} vs random {r}"


def test_greedy_player_host_interface():
    spec = make_game("minivilles")
    players = [greedy_player(spec), random_player(spec)]
    result, _ = play_host_game(spec, players, jax.random.PRNGKey(2))
    assert result.shape == (2,)


def test_glicko_update_sweep_edge_case():
    """A clean sweep at an extreme rating gap must not divide by zero
    (E*(1-E) underflow guard in utils/ratings._expect)."""
    from alphazero_tpu.utils.ratings import Rating, update, update_pair
    strong = Rating(3000.0, 60.0, 0.06)
    weak = Rating(500.0, 60.0, 0.06)
    r = update(strong, [weak] * 128, [1.0] * 128)
    assert r.rating >= strong.rating - 1.0
    ratings = {}
    update_pair(ratings, "a", "b", 128, 0, 0)
    update_pair(ratings, "a", "b", 128, 0, 0)
    update_pair(ratings, "a", "b", 128, 0, 0)
    assert ratings["a"].rating > ratings["b"].rating
