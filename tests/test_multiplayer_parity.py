"""Full-game oracle parity for the 3-5 player variants.

The reference treats player count as a first-class compile-time variant
(NUMBER_PLAYERS constants, SURVEY.md §2.4); round 1 exercised the oracle
mostly at 2 players.  This suite runs every multi-player factory range
against the patched-constant oracle at least once: splendor 3p/4p,
minivilles 3p/4p, TLP 4p/5p, smallworld 4p/5p, akropolis 3p/4p.
(Azul, Santorini, Abalone, Botanik are 2-player in the reference.)
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alphazero_tpu.config import MAGIC_SEEDS
from alphazero_tpu.games import make_game
from tests.reference_oracle import (REFERENCE_PATH, import_reference_splendor,
                                    install_numba_stub)


def _full_game_loop(spec, board, state, step_pair, game_seed, check_score=True):
    """Shared ply loop: compare valids/terminal/score/state every move."""
    rng = np.random.default_rng(game_seed)
    valids_f = jax.jit(spec.valids)
    terminal_f = jax.jit(spec.terminal)
    score_f = jax.jit(spec.get_score)
    step_f = jax.jit(lambda s, a, seed: spec.step_canonical(
        s, jnp.asarray(a, jnp.int32), jax.random.PRNGKey(0),
        jnp.asarray(seed, jnp.int32)))

    for ply in range(spec.max_game_length):
        v_ref = np.asarray(board.valid_moves(0), bool)
        v_jax = np.asarray(valids_f(jnp.asarray(state)))
        np.testing.assert_array_equal(
            v_jax, v_ref, err_msg=f"valids diverge at ply {ply}")
        try:
            t_ref = np.asarray(board.check_end_game(0), np.float32)
        except TypeError:
            t_ref = np.asarray(board.check_end_game(), np.float32)
        t_jax = np.asarray(terminal_f(jnp.asarray(state)))
        np.testing.assert_allclose(
            t_jax, t_ref, atol=1e-7, err_msg=f"terminal diverges at ply {ply}")
        if check_score:
            for p in range(spec.num_players):
                assert float(score_f(jnp.asarray(state), jnp.int32(p))) == \
                    float(board.get_score(p)), f"score p{p} ply {ply}"
        if t_ref.any():
            return

        action = int(rng.choice(np.flatnonzero(v_ref)))
        nxt, seed = step_pair(board, action, ply, rng)
        if nxt != 0:
            board.swap_players(nxt)
        st, swap = step_f(jnp.asarray(state), action, seed)
        state = np.asarray(st)
        assert int(swap) == nxt, f"ply {ply}: swap {int(swap)} != {nxt}"
        np.testing.assert_array_equal(
            state, board.get_state(),
            err_msg=f"state diverges after ply {ply} action {action}")
    pytest.fail("game did not terminate within max_game_length")


def _lcg_step_pair(lcg_seed):
    def step_pair(board, action, ply, rng):
        board.copy_state(board.get_state(), True)
        return board.make_move(action, 0, random_seed=lcg_seed), lcg_seed
    return step_pair


def _magic_step_pair():
    def step_pair(board, action, ply, rng):
        seed = int(MAGIC_SEEDS[ply % len(MAGIC_SEEDS)])
        board.copy_state(board.get_state(), True)
        return board.make_move(action, 0, random_seed=seed), seed
    return step_pair


def _import_patched(pkg, const_mod, logic_mod, patch):
    """Re-import a reference game package with patched constants (the
    pattern from tests/test_smallworld_parity.py::import_oracle)."""
    import sys
    install_numba_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    for m in list(sys.modules):
        if m.startswith(pkg):
            del sys.modules[m]
    import importlib
    C = importlib.import_module(const_mod)
    for k, v in patch.items():
        setattr(C, k, v)
    return importlib.import_module(logic_mod)


# ---------------------------------------------------------------- splendor

@pytest.mark.parametrize("n", [3, 4])
def test_splendor_multiplayer(n):
    L = import_reference_splendor(num_players=n)
    spec = make_game("splendor", num_players=n)
    np.random.seed(n)
    board = L.Board(n)
    state = np.array(board.get_state(), copy=True)
    _full_game_loop(spec, board, state, _magic_step_pair(), game_seed=n)


# -------------------------------------------------------------- minivilles

@pytest.mark.parametrize("n", [3, 4])
def test_minivilles_multiplayer(n):
    from tests.test_minivilles_parity import DiceScript
    import importlib
    import sys
    install_numba_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    for m in list(sys.modules):
        if m.startswith("minivilles"):
            del sys.modules[m]
    L = importlib.import_module("minivilles.MinivillesLogicNumba")
    spec = make_game("minivilles", num_players=n)
    script = DiceScript()
    np.random.randint = script
    try:
        np.random.seed(n)
        board = L.Board(n)
        state = np.array(board.get_state(), copy=True)

        def step_pair(board, action, ply, rng):
            d1, d2 = int(rng.integers(1, 6)), int(rng.integers(1, 6))
            script.set(d1, d2)
            board.copy_state(board.get_state(), True)
            return (board.make_move(action, 0, random_seed=0),
                    d1 + 5 * (d2 - 1))

        _full_game_loop(spec, board, state, step_pair, game_seed=n,
                        check_score=False)
    finally:
        np.random.randint = script.orig


# --------------------------------------------------------------------- TLP

@pytest.mark.parametrize("n", [4, 5])
def test_tlp_multiplayer(n):
    from tests.test_tlp_parity import DrawRecorder
    import sys
    install_numba_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    for m in list(sys.modules):
        if m.startswith("thelittleprince"):
            del sys.modules[m]
    import thelittleprince.TLPLogicNumba as L
    spec = make_game("thelittleprince", num_players=n)
    rec = DrawRecorder(L).install()
    try:
        np.random.seed(n)
        board = L.Board(n)
        state = np.array(board.get_state(), copy=True)

        def step_pair(board, action, ply, rng):
            rec.ranks.clear()
            board.copy_state(board.get_state(), True)
            nxt = board.make_move(action, 0, random_seed=0)
            return nxt, rec.seed()

        _full_game_loop(spec, board, state, step_pair, game_seed=n)
    finally:
        rec.uninstall()


# -------------------------------------------------------------- smallworld

# the reference ships maps for 2-4 players only (SmallworldMaps.py:2-10)
@pytest.mark.parametrize("n,lcg", [(4, 42), (3, 7)])
def test_smallworld_multiplayer(n, lcg):
    from tests.test_smallworld_parity import import_oracle
    L = import_oracle(n)
    spec = make_game("smallworld", num_players=n)
    np.random.seed(n)
    board = L.Board(n)
    state = np.array(board.get_state(), copy=True)
    _full_game_loop(spec, board, state, _lcg_step_pair(lcg), game_seed=n,
                    check_score=False)


# --------------------------------------------------------------- akropolis

@pytest.mark.parametrize("n,lcg", [(3, 42), (4, 7)])
def test_akropolis_multiplayer(n, lcg):
    L = _import_patched("akropolis", "akropolis.AkropolisConstants",
                        "akropolis.AkropolisLogicNumba",
                        {"N_PLAYERS": n, "CONSTR_SITE_SIZE": n + 2})
    spec = make_game("akropolis", num_players=n)
    np.random.seed(n)
    board = L.Board(n)
    state = np.array(board.get_state(), copy=True)

    def step_pair(board, action, ply, rng):
        board.copy_state(board.get_state(), True)
        nxt = board.make_move(action, 0, random_seed=lcg)
        return nxt, lcg

    _full_game_loop(spec, board, state, step_pair, game_seed=n,
                    check_score=False)
