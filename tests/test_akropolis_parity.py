"""Parity of the JAX Akropolis engine vs the upstream reference.

The oracle's initial construction-site draw is true-random (np.random.choice),
so each game seeds numpy, builds the oracle board, and copies its state into
our engine (layouts are identical).  All subsequent draws use the reference's
deterministic LCG (random_seed != 0), which both engines reproduce bit-exactly.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alphazero_tpu.games import make_game
from tests.reference_oracle import install_numba_stub, REFERENCE_PATH


@pytest.fixture(scope="module")
def oracle_mod():
    import sys
    install_numba_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    for m in list(sys.modules):
        if m.startswith("akropolis"):
            del sys.modules[m]
    import akropolis.AkropolisLogicNumba as L
    return L


@pytest.fixture(scope="module")
def spec():
    return make_game("akropolis", num_players=2)


def test_static_tables(spec, oracle_mod):
    from alphazero_tpu.games import akropolis as A
    np.testing.assert_array_equal(A.NEIGHBORS, oracle_mod.NEIGHBORS)
    np.testing.assert_array_equal(A.PATTERNS, oracle_mod.PATTERNS)
    np.testing.assert_array_equal(A.PATTERN_NEI, oracle_mod.PATTERN_NEI)
    from akropolis.AkropolisConstants import TILES_DATA as REF_TILES
    np.testing.assert_array_equal(A.TILES_DATA, REF_TILES)


@pytest.mark.parametrize("game_seed,lcg_seed",
                         [(0, 42), (1, 31416), (2, 7), (3, 14142), (4, 1)])
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
            assert ply >= 30   # a full 2p game places 36 tiles
            return

        action = int(rng.choice(np.flatnonzero(v_ref)))
        board.copy_state(board.get_state(), True)
        nxt = board.make_move(action, 0, random_seed=lcg_seed)
        board.swap_players(nxt)
        st, swap = step_f(jnp.asarray(state), action)
        state = np.asarray(st)
        assert int(swap) == nxt
        np.testing.assert_array_equal(
            state, board.get_state(),
            err_msg=f"state diverges after ply {ply} action {action}")
        r_ref = float(board.get_score(0))
        r_jax = float(spec.get_score(jnp.asarray(state), jnp.int32(0)))
        assert r_ref == r_jax, f"score diverges at ply {ply}"
    pytest.fail("game did not terminate")


def test_init_structure(spec):
    state = np.asarray(spec.init(jax.random.PRNGKey(3)))
    # start tile: blue plaza at center, 3 quarries, all heights 1
    assert state[6, 6, 0] == 7 and state[6, 6, 2] == 1
    assert (state[:, :, 2] == 1).sum() == 4
    # stones 1/2, construction site full, 11 stacks left
    assert state[4, 1, 6] == 1 and state[5, 1, 6] == 2
    assert (state[:4, 0, 7] != 0).all()
    assert state[5, 1, 7] == 11
    # bitfield: 37 playable tiles minus 4 drawn
    from alphazero_tpu.games.akropolis import _BIT_W
    bits = ((state[4, :8, 7].astype(np.int32)[:, None] & _BIT_W) > 0)
    assert bits.sum() == 37 - 4


@pytest.mark.parametrize("n", [3, 4])
def test_multiplayer_random_game(n):
    """3p/4p variants (reference supports them via the N_PLAYERS constant):
    games run to completion with consistent deck accounting."""
    sp = make_game("akropolis", num_players=n)
    rng = np.random.default_rng(n)
    state = sp.init(jax.random.PRNGKey(n))
    step_f = jax.jit(lambda s, a: sp.step_canonical(
        s, a, jax.random.PRNGKey(7), jnp.int32(0)))
    for ply in range(sp.max_game_length):
        t = np.asarray(sp.terminal(state))
        if t.any():
            # 12n+12 moves place all tiles but one
            assert ply == 12 * n + 12
            assert (t == 1.0).sum() + (t == 0.001).sum() >= 1
            return
        v = np.asarray(sp.valids(state))
        assert v.any()
        a = jnp.int32(int(rng.choice(np.flatnonzero(v))))
        state, swap = step_f(state, a)
        assert int(swap) == 1
    pytest.fail("game did not terminate")


def test_rotation_symmetry_consistency(spec):
    """Rotating a compact city about the start tile is a true symmetry:
    the rotated state's valid moves must equal the rotated valid-move mask."""
    rng = np.random.default_rng(0)
    state = spec.init(jax.random.PRNGKey(0))
    step_f = jax.jit(lambda s, a: spec.step_canonical(
        s, a, jax.random.PRNGKey(1), jnp.int32(7)))
    for _ in range(6):
        v = np.asarray(spec.valids(state))
        a = jnp.int32(int(rng.choice(np.flatnonzero(v))))
        state, _ = step_f(state, a)

    v = spec.valids(state)
    pi = v.astype(jnp.float32) / jnp.sum(v)
    sts, pis, vas = spec.symmetries(state, pi, v)
    np.testing.assert_array_equal(np.asarray(sts[0]), np.asarray(state))
    n_rotated = 0
    for k in range(1, 6):
        # every emitted variant is self-consistent: pi normalized, and the
        # rotated mask is a subset of the rotated state's own valid moves
        # (fringe actions may drop when they rotate off the rhombus)
        np.testing.assert_allclose(float(jnp.sum(pis[k])), 1.0, atol=1e-6)
        v_rot = np.asarray(spec.valids(sts[k]))
        va_k = np.asarray(vas[k])
        assert (va_k <= v_rot).all(), f"rotation k={k}: bad action kept"
        if not np.array_equal(np.asarray(sts[k]), np.asarray(state)):
            n_rotated += 1
            # city geometry preserved
            assert np.asarray(sts[k])[:, :, 2:4].sum() \
                == np.asarray(state)[:, :, 2:4].sum()
    assert n_rotated >= 1, "all rotations degenerated to the identity"
