"""Bit-exact parity of the JAX Santorini engine vs the upstream reference.

Golden-trace strategy from SURVEY.md §4 / reference launcher.py: random full
playthroughs where at every ply we compare valid-move vectors, terminal
vectors and post-move canonical states byte-for-byte.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alphazero_tpu.games import make_game
from tests.reference_oracle import import_reference_santorini, make_oracle_board

NB_GODS = 1


@pytest.fixture(scope="module")
def spec():
    return make_game("santorini", nb_gods=NB_GODS, init_method=0)


@pytest.fixture(scope="module")
def oracle_mod():
    return import_reference_santorini(nb_gods=NB_GODS, init_method=0)


@pytest.fixture(scope="module")
def jitted(spec):
    valids = jax.jit(spec.valids)
    terminal = jax.jit(spec.terminal)

    def step_c(state, a):
        return spec.step_canonical(state, jnp.asarray(a, jnp.int32),
                                   jax.random.PRNGKey(0), jnp.int32(0))

    return valids, terminal, jax.jit(step_c)


def test_init_matches_oracle(spec, oracle_mod):
    board = make_oracle_board(oracle_mod, NB_GODS)
    ours = np.asarray(spec.init(jax.random.PRNGKey(0)))
    np.testing.assert_array_equal(ours, board.get_state())


@pytest.mark.parametrize("game_seed", range(8))
def test_full_game_parity(spec, oracle_mod, jitted, game_seed):
    valids_f, terminal_f, step_f = jitted
    rng = np.random.default_rng(game_seed)

    board = make_oracle_board(oracle_mod, NB_GODS)
    state = np.asarray(spec.init(jax.random.PRNGKey(0)))
    np.testing.assert_array_equal(state, board.get_state())

    for ply in range(spec.max_game_length):
        v_ref = np.asarray(board.valid_moves(0), dtype=bool)
        v_jax = np.asarray(valids_f(state))
        np.testing.assert_array_equal(
            v_jax, v_ref, err_msg=f"valid moves diverge at ply {ply}")

        t_ref = np.asarray(board.check_end_game(0), dtype=np.float32)
        t_jax = np.asarray(terminal_f(state))
        np.testing.assert_array_equal(
            t_jax, t_ref, err_msg=f"terminal vector diverges at ply {ply}")
        if t_ref.any():
            return  # game over, full parity

        action = int(rng.choice(np.flatnonzero(v_ref)))

        # reference: make_move + swap_players on a fresh copy (MCTS.py:233-248)
        board.copy_state(board.get_state(), True)
        nxt_player = board.make_move(action, 0, random_seed=0)
        if nxt_player != 0:
            board.swap_players(nxt_player)
        s_ref = board.get_state()

        state, swap = step_f(state, action)
        state = np.asarray(state)
        assert int(swap) == nxt_player
        np.testing.assert_array_equal(
            state, s_ref, err_msg=f"state diverges after ply {ply} action {action}")

    pytest.fail("game did not terminate within max_game_length")


def test_symmetries_parity(spec, oracle_mod, jitted):
    valids_f, _, step_f = jitted
    rng = np.random.default_rng(123)
    board = make_oracle_board(oracle_mod, NB_GODS)
    state = np.asarray(spec.init(jax.random.PRNGKey(0)))

    sym_f = jax.jit(spec.symmetries)
    for ply in range(12):
        v = np.asarray(valids_f(state))
        if not v.any():
            break
        pi = rng.random(spec.num_actions).astype(np.float32) * v
        pi /= pi.sum()

        board.copy_state(state.copy(), False)
        ref_syms = board.get_symmetries(pi.copy(), v.copy())
        st, pis, vas = sym_f(state, jnp.asarray(pi), jnp.asarray(v))
        st, pis, vas = np.asarray(st), np.asarray(pis), np.asarray(vas)

        assert len(ref_syms) == spec.num_symmetries == st.shape[0]
        for i, (rs, rp, rv) in enumerate(ref_syms):
            np.testing.assert_array_equal(st[i], rs, err_msg=f"sym {i} state")
            np.testing.assert_allclose(pis[i], rp, rtol=1e-6,
                                       err_msg=f"sym {i} policy")
            np.testing.assert_array_equal(vas[i], np.asarray(rv, bool),
                                          err_msg=f"sym {i} valids")

        action = int(rng.choice(np.flatnonzero(v)))
        board.copy_state(state, True)
        nxt = board.make_move(action, 0, random_seed=0)
        if nxt != 0:
            board.swap_players(nxt)
        state, _ = step_f(state, action)
        state = np.asarray(state)


def test_scores_and_round(spec, oracle_mod, jitted):
    valids_f, terminal_f, step_f = jitted
    rng = np.random.default_rng(7)
    board = make_oracle_board(oracle_mod, NB_GODS)
    state = np.asarray(spec.init(jax.random.PRNGKey(0)))
    score_f = jax.jit(spec.get_score)
    round_f = jax.jit(spec.get_round)

    for _ in range(20):
        for p in (0, 1):
            assert float(score_f(state, p)) == float(board.get_score(p))
        assert int(round_f(state)) == int(board.get_round())
        v = np.asarray(valids_f(state))
        if not v.any() or np.asarray(terminal_f(state)).any():
            break
        a = int(rng.choice(np.flatnonzero(v)))
        board.copy_state(state, True)
        nxt = board.make_move(a, 0, random_seed=0)
        if nxt != 0:
            board.swap_players(nxt)
        state, _ = step_f(state, a)
        state = np.asarray(state)


def test_vmapped_batch_consistency(spec):
    """Batched lockstep stepping equals per-board stepping."""
    B = 32
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.vmap(spec.init)(keys)
    v = jax.vmap(spec.valids)(states)
    assert v.shape == (B, spec.num_actions)
    # pick first valid action per board, step all in lockstep
    acts = jnp.argmax(v, axis=-1)
    step = jax.vmap(lambda s, a: spec.step_canonical(
        s, a, jax.random.PRNGKey(1), jnp.int32(0)))
    ns, swaps = step(states, acts)
    single = spec.step_canonical(states[3], acts[3], jax.random.PRNGKey(1),
                                 jnp.int32(0))[0]
    np.testing.assert_array_equal(np.asarray(ns[3]), np.asarray(single))
    assert bool((swaps == 1).all())
