"""Parity of the JAX Small World engine vs the upstream reference.

With random_seed != 0 every chance event in the reference is a
state-counter-keyed LCG (dice, SmallworldLogicNumba.py:424-430; deck draws,
:1372-1381), so after copying the oracle's randomly initialized board both
engines evolve fully deterministically and can be compared bit-exactly
move by move.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alphazero_tpu.games import make_game
from tests.reference_oracle import install_numba_stub, REFERENCE_PATH


def import_oracle(num_players):
    import sys
    install_numba_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    for m in list(sys.modules):
        if m.startswith("smallworld"):
            del sys.modules[m]
    import smallworld.SmallworldConstants as C
    C.NUMBER_PLAYERS = num_players
    import smallworld.SmallworldLogicNumba as L
    return L


@pytest.fixture(scope="module")
def oracle_mod():
    return import_oracle(2)


@pytest.fixture(scope="module")
def spec():
    return make_game("smallworld", num_players=2)


@pytest.mark.parametrize("game_seed,lcg_seed",
                         [(0, 42), (1, 31416), (2, 7), (3, 27183)])
def test_full_game_parity(spec, oracle_mod, game_seed, lcg_seed):
    rng = np.random.default_rng(game_seed)
    np.random.seed(game_seed)
    board = oracle_mod.Board(2)
    state = np.array(board.get_state(), copy=True)

    valids_f = jax.jit(spec.valids)
    terminal_f = jax.jit(spec.terminal)
    step_f = jax.jit(lambda s, a: spec.step_canonical(
        s, jnp.asarray(a, jnp.int32), jax.random.PRNGKey(0),
        jnp.asarray(lcg_seed, jnp.int32)))

    for ply in range(spec.max_game_length):
        v_ref = np.asarray(board.valid_moves(0), bool)
        v_jax = np.asarray(valids_f(jnp.asarray(state)))
        np.testing.assert_array_equal(
            v_jax, v_ref, err_msg=f"valids diverge at ply {ply}")
        t_ref = np.asarray(board.check_end_game(0), np.float32)
        t_jax = np.asarray(terminal_f(jnp.asarray(state)))
        np.testing.assert_allclose(
            t_jax, t_ref, atol=1e-7, err_msg=f"terminal diverges at ply {ply}")
        if t_ref.any():
            assert ply > 20
            return
        assert v_ref.any(), f"oracle has no valid moves at ply {ply}"

        action = int(rng.choice(np.flatnonzero(v_ref)))
        board.copy_state(board.get_state(), True)
        nxt = board.make_move(action, 0, random_seed=lcg_seed)
        if nxt != 0:
            board.swap_players(nxt)
        st, swap = step_f(jnp.asarray(state), action)
        state = np.asarray(st)
        assert int(swap) == nxt, f"ply {ply}: swap {int(swap)} != {nxt}"
        np.testing.assert_array_equal(
            state, board.get_state(),
            err_msg=f"state diverges after ply {ply} action {action}")
    pytest.fail("game did not terminate")


def test_init_structure(spec):
    state = np.asarray(spec.init(jax.random.PRNGKey(5)))
    from alphazero_tpu.games.smallworld import LOST_TRIBE
    A = spec.meta.nb_areas
    # lost tribes on flagged areas, 6 distinct deck combos, round 1
    lt = (state[:A, 1] == LOST_TRIBE)
    from alphazero_tpu.games.smallworld_maps import load_map
    descr, _, _ = load_map(2)
    np.testing.assert_array_equal(lt, descr[:, 4] != 0)
    deck = state[A + 6:A + 12]
    assert (deck[:, 1] > 0).all() and (deck[:, 2] > 0).all()
    assert len(set(deck[:, 1].tolist())) == 6
    assert len(set(deck[:, 2].tolist())) == 6
    assert float(spec.get_score(jnp.asarray(state), jnp.int32(0))) == 5.0
    assert int(spec.get_round(jnp.asarray(state))) == 1


def test_full_game_parity_3p():
    """3-player map (30 areas): n-way swaps, sorcerer/diplomat bitfields."""
    L3 = import_oracle(3)
    sp = make_game("smallworld", num_players=3)
    rng = np.random.default_rng(9)
    np.random.seed(9)
    board = L3.Board(3)
    state = np.array(board.get_state(), copy=True)
    step_f = jax.jit(lambda s, a: sp.step_canonical(
        s, jnp.asarray(a, jnp.int32), jax.random.PRNGKey(0),
        jnp.asarray(14142, jnp.int32)))
    valids_f = jax.jit(sp.valids)
    terminal_f = jax.jit(sp.terminal)
    for ply in range(sp.max_game_length):
        v_ref = np.asarray(board.valid_moves(0), bool)
        np.testing.assert_array_equal(
            np.asarray(valids_f(jnp.asarray(state))), v_ref,
            err_msg=f"valids diverge at ply {ply}")
        t_ref = np.asarray(board.check_end_game(0), np.float32)
        np.testing.assert_allclose(
            np.asarray(terminal_f(jnp.asarray(state))), t_ref, atol=1e-7)
        if t_ref.any():
            return
        action = int(rng.choice(np.flatnonzero(v_ref)))
        board.copy_state(board.get_state(), True)
        nxt = board.make_move(action, 0, random_seed=14142)
        if nxt != 0:
            board.swap_players(nxt)
        st, swap = step_f(jnp.asarray(state), action)
        state = np.asarray(st)
        assert int(swap) == nxt
        np.testing.assert_array_equal(
            state, board.get_state(),
            err_msg=f"state diverges after ply {ply} action {action}")
    pytest.fail("game did not terminate")


def test_random_game_terminates(spec):
    rng = np.random.default_rng(11)
    state = spec.init(jax.random.PRNGKey(11))
    step_f = jax.jit(lambda s, a, k: spec.step_canonical(
        s, a, k, jnp.int32(0)))
    for ply in range(spec.max_game_length):
        t = np.asarray(spec.terminal(state))
        if t.any():
            assert (t == -1.0).sum() <= 1
            return
        v = np.asarray(spec.valids(state))
        assert v.any(), f"no valid moves at ply {ply}"
        a = jnp.int32(int(rng.choice(np.flatnonzero(v))))
        state, _ = step_f(state, a, jax.random.PRNGKey(5000 + ply))
    pytest.fail("game did not terminate")
