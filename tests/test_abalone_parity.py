"""Bit-exact parity of the JAX Abalone engine vs the upstream reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alphazero_tpu.games import make_game
from tests.reference_oracle import install_numba_stub, REFERENCE_PATH


def oracle(layout):
    import sys
    install_numba_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    for m in list(sys.modules):
        if m.startswith("abalone"):
            del sys.modules[m]
    import abalone.AbaloneLogicNumba as L
    L.INITIAL_LAYOUT = layout
    return L


@pytest.fixture(scope="module", params=[0, 1, 2])
def env(request):
    layout = request.param
    L = oracle(layout)
    spec = make_game("abalone", initial_layout=layout)
    jitted = (jax.jit(spec.valids), jax.jit(spec.terminal),
              jax.jit(lambda s, a: spec.step_canonical(
                  s, jnp.asarray(a, jnp.int32), jax.random.PRNGKey(0),
                  jnp.int32(0))))
    return L, spec, jitted


def test_full_game_parity(env):
    L, spec, (valids_f, terminal_f, step_f) = env
    for game_seed in range(3):
        rng = np.random.default_rng(game_seed)
        board = L.Board(2)
        state = np.asarray(spec.init(jax.random.PRNGKey(0)))
        np.testing.assert_array_equal(state, board.get_state())

        for ply in range(spec.max_game_length):
            v_ref = np.asarray(board.valid_moves(0), bool)
            v_jax = np.asarray(valids_f(jnp.asarray(state)))
            np.testing.assert_array_equal(
                v_jax, v_ref, err_msg=f"valids diverge at ply {ply}")
            t_ref = np.asarray(board.check_end_game(0), np.float32)
            t_jax = np.asarray(terminal_f(jnp.asarray(state)))
            np.testing.assert_allclose(t_jax, t_ref, atol=1e-7)
            if t_ref.any():
                break
            a = int(rng.choice(np.flatnonzero(v_ref)))
            board.copy_state(board.get_state(), True)
            nxt = board.make_move(a, 0, random_seed=0)
            if nxt != 0:
                board.swap_players(nxt)
            st, swap = step_f(jnp.asarray(state), a)
            state = np.asarray(st)
            assert int(swap) == nxt
            np.testing.assert_array_equal(
                state, board.get_state(),
                err_msg=f"state diverges after ply {ply} action {a}")
        else:
            pytest.fail("game did not terminate")


def test_symmetries_parity(env):
    L, spec, (valids_f, _, step_f) = env
    rng = np.random.default_rng(1)
    board = L.Board(2)
    state = np.asarray(spec.init(jax.random.PRNGKey(0)))
    sym_f = jax.jit(spec.symmetries)
    for ply in range(6):
        v = np.asarray(board.valid_moves(0), bool)
        pi = rng.random(spec.num_actions).astype(np.float32) * v
        pi /= pi.sum()
        board.copy_state(state.copy(), False)
        ref_syms = board.get_symmetries(pi.copy(), v.copy())
        st, pis, vas = map(np.asarray, sym_f(jnp.asarray(state),
                                             jnp.asarray(pi), jnp.asarray(v)))
        assert len(ref_syms) == 12 == st.shape[0]
        for i, (rs, rp, rv) in enumerate(ref_syms):
            np.testing.assert_array_equal(st[i], rs, err_msg=f"sym {i} state")
            np.testing.assert_allclose(pis[i], rp, rtol=1e-6,
                                       err_msg=f"sym {i} policy")
            np.testing.assert_array_equal(vas[i], np.asarray(rv, bool),
                                          err_msg=f"sym {i} valids")
        a = int(rng.choice(np.flatnonzero(v)))
        board.copy_state(state, True)
        nxt = board.make_move(a, 0, random_seed=0)
        if nxt != 0:
            board.swap_players(nxt)
        st2, _ = step_f(jnp.asarray(state), a)
        state = np.asarray(st2)


def test_marble_conservation(env):
    L, spec, (valids_f, terminal_f, step_f) = env
    rng = np.random.default_rng(4)
    state = np.asarray(spec.init(jax.random.PRNGKey(0)))
    for ply in range(60):
        if np.asarray(terminal_f(jnp.asarray(state))).any():
            break
        v = np.asarray(valids_f(jnp.asarray(state)))
        a = int(rng.choice(np.flatnonzero(v)))
        st, _ = step_f(jnp.asarray(state), a)
        state = np.asarray(st)
        # marbles on board + ejected == 14 per side
        m = state[:, :, 0].sum() + state[0, 1, 3]  # opp score = my ejected...
        o = state[:, :, 1].sum() + state[0, 0, 3]
        assert m + o == 28
