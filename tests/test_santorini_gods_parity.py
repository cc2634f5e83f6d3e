"""Bit-exact parity of the full-gods Santorini engine vs the reference.

nb_gods=11 exercises the complete god dispatch (SantoriniLogicNumba.py:
125-432): Apollo swaps, Minotaur pushes, Atlas domes, Hephaestus double
builds, Artemis/Demeter/Hermes/Prometheus multi-turn play-again flows, Pan's
descent win, and Athena's climb lock.  Santorini has no chance nodes after
init, so games are fully deterministic once the oracle's random start state
is copied over.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alphazero_tpu.games import make_game
from tests.reference_oracle import import_reference_santorini


@pytest.fixture(scope="module")
def oracle_mod():
    return import_reference_santorini(nb_gods=11, init_method=1)


@pytest.fixture(scope="module")
def spec():
    return make_game("santorini", nb_gods=11, init_method=1)


@pytest.fixture(scope="module")
def jitted(spec):
    valids = jax.jit(spec.valids)
    terminal = jax.jit(spec.terminal)

    def step_c(state, a):
        return spec.step_canonical(state, jnp.asarray(a, jnp.int32),
                                   jax.random.PRNGKey(0), jnp.int32(0))

    return valids, terminal, jax.jit(step_c)


@pytest.mark.parametrize("game_seed", range(12))
def test_full_game_parity(spec, oracle_mod, jitted, game_seed):
    """12 seeds so most of the 10 gods appear on one side or the other."""
    valids_f, terminal_f, step_f = jitted
    rng = np.random.default_rng(game_seed)
    np.random.seed(game_seed)
    board = oracle_mod.Board(2)
    state = np.array(board.get_state(), copy=True)
    gods = sorted(int(g) for g in
                  np.flatnonzero(np.asarray(board.gods_power).reshape(-1)
                                 [:22] > 0))

    for ply in range(spec.max_game_length):
        v_ref = np.asarray(board.valid_moves(0), bool)
        v_jax = np.asarray(valids_f(jnp.asarray(state)))
        np.testing.assert_array_equal(
            v_jax, v_ref,
            err_msg=f"valids diverge at ply {ply} (gods {gods})")
        t_ref = np.asarray(board.check_end_game(0), np.float32)
        t_jax = np.asarray(terminal_f(jnp.asarray(state)))
        np.testing.assert_allclose(
            t_jax, t_ref, atol=1e-7,
            err_msg=f"terminal diverges at ply {ply} (gods {gods})")
        if t_ref.any():
            return

        action = int(rng.choice(np.flatnonzero(v_ref)))
        board.copy_state(board.get_state(), True)
        nxt = board.make_move(action, 0, random_seed=0)
        if nxt != 0:
            board.swap_players(nxt)
        st, swap = step_f(jnp.asarray(state), action)
        state = np.asarray(st)
        assert int(swap) == (1 if nxt != 0 else 0), f"ply {ply}"
        np.testing.assert_array_equal(
            state, board.get_state(),
            err_msg=f"state diverges after ply {ply} action {action} "
                    f"(gods {gods})")
    pytest.fail("game did not terminate")


def test_symmetries_consistency_with_god_payloads(spec):
    """Rotating a state with active Artemis/Demeter payloads must keep the
    rotated mask equal to the rotated state's own valid moves."""
    rng = np.random.default_rng(3)
    checked = 0
    valids_f = jax.jit(spec.valids)
    valids_v = jax.jit(jax.vmap(spec.valids))
    sym_f = jax.jit(spec.symmetries)
    term_f = jax.jit(spec.terminal)
    step_f = jax.jit(lambda s, a: spec.step_canonical(
        s, a, jax.random.PRNGKey(0), jnp.int32(0)))
    for seed in range(6):
        state = spec.init(jax.random.PRNGKey(seed))
        for ply in range(24):
            if np.asarray(term_f(state)).any():
                break
            v = valids_f(state)
            vn = np.asarray(v)
            sts, pis, vas = sym_f(
                state, v.astype(jnp.float32) / max(vn.sum(), 1), v)
            np.testing.assert_array_equal(
                np.asarray(valids_v(sts)), np.asarray(vas),
                err_msg=f"seed {seed} ply {ply}")
            checked += 1
            a = jnp.int32(int(rng.choice(np.flatnonzero(vn))))
            state, _ = step_f(state, a)
    assert checked > 50
