"""Bit-exact parity of the JAX Azul engine vs the upstream reference,
including bag-draw chance through the deterministic LCG."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alphazero_tpu.config import MAGIC_SEEDS
from alphazero_tpu.games import make_game
from tests.reference_oracle import (install_colorama_stub,
                                    install_numba_stub, REFERENCE_PATH)


@pytest.fixture(scope="module")
def spec():
    return make_game("azul")


@pytest.fixture(scope="module")
def oracle_mod():
    import sys
    install_numba_stub()
    install_colorama_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    for m in list(sys.modules):
        if m.startswith("azul"):
            del sys.modules[m]
    import azul.AzulLogicNumba as L
    # the reference's get_symmetries does 30*(p+1) with p int8 — numba
    # promotes, pure numpy overflows; widen the table for the oracle
    L.np_factory_symmetries = L.np_factory_symmetries.astype(np.int64)
    return L


@pytest.fixture(scope="module")
def jitted(spec):
    return (jax.jit(spec.valids), jax.jit(spec.terminal),
            jax.jit(lambda s, a, seed: spec.step_canonical(
                s, jnp.asarray(a, jnp.int32), jax.random.PRNGKey(0),
                jnp.asarray(seed, jnp.int32))))


def fresh_board(L, np_seed):
    np.random.seed(np_seed)
    b = L.Board()
    b.init_game()
    return b


@pytest.mark.parametrize("game_seed", range(6))
def test_full_game_parity(spec, oracle_mod, jitted, game_seed):
    valids_f, terminal_f, step_f = jitted
    rng = np.random.default_rng(game_seed)
    board = fresh_board(oracle_mod, game_seed)
    state = np.array(board.get_state(), copy=True)

    for ply in range(spec.max_game_length):
        v_ref = np.asarray(board.valid_moves(0), bool)
        v_jax = np.asarray(valids_f(jnp.asarray(state)))
        np.testing.assert_array_equal(
            v_jax, v_ref, err_msg=f"valids diverge at ply {ply}")

        t_ref = np.asarray(board.check_end_game(), np.float32)
        t_jax = np.asarray(terminal_f(jnp.asarray(state)))
        np.testing.assert_allclose(
            t_jax, t_ref, atol=1e-7,
            err_msg=f"terminal diverges at ply {ply}")
        if t_ref.any():
            return

        action = int(rng.choice(np.flatnonzero(v_ref)))
        seed = int(MAGIC_SEEDS[ply % len(MAGIC_SEEDS)])

        board.copy_state(board.get_state(), True)
        nxt = board.make_move(action, 0, random_seed=seed)
        if nxt != 0:
            board.swap_players(nxt)
        s_ref = board.get_state()

        st, swap = step_f(jnp.asarray(state), action, seed)
        state = np.asarray(st)
        assert int(swap) == nxt, f"ply {ply}: swap {int(swap)} != {nxt}"
        np.testing.assert_array_equal(
            state, s_ref,
            err_msg=f"state diverges after ply {ply} action {action}")

    pytest.fail("game did not terminate")


def test_symmetries_parity(spec, oracle_mod, jitted):
    valids_f, _, step_f = jitted
    rng = np.random.default_rng(3)
    board = fresh_board(oracle_mod, 3)
    state = np.array(board.get_state(), copy=True)
    sym_f = jax.jit(spec.symmetries)

    for ply in range(10):
        v = np.asarray(board.valid_moves(0), bool)
        pi = (rng.random(180).astype(np.float32) * v)
        pi /= max(pi.sum(), 1e-9)

        board.copy_state(state.copy(), False)
        ref_syms = board.get_symmetries(pi.copy(), v.copy())
        st, pis, vas = map(np.asarray, sym_f(jnp.asarray(state),
                                             jnp.asarray(pi), jnp.asarray(v)))
        assert st.shape[0] == spec.num_symmetries == len(ref_syms)
        for i, (rs, rp, rv) in enumerate(ref_syms):
            np.testing.assert_array_equal(st[i], rs, err_msg=f"sym {i} state")
            np.testing.assert_allclose(pis[i], rp, rtol=1e-6)
            np.testing.assert_array_equal(vas[i], np.asarray(rv, bool))

        a = int(rng.choice(np.flatnonzero(v)))
        board.copy_state(state, True)
        nxt = board.make_move(a, 0, random_seed=5)
        if nxt != 0:
            board.swap_players(nxt)
        st2, _ = step_f(jnp.asarray(state), a, 5)
        state = np.asarray(st2)
        np.testing.assert_array_equal(state, board.get_state())


def test_scores_round_and_batch(spec, oracle_mod, jitted):
    valids_f, terminal_f, step_f = jitted
    rng = np.random.default_rng(9)
    board = fresh_board(oracle_mod, 9)
    state = np.array(board.get_state(), copy=True)
    score_f = jax.jit(spec.get_score)
    for ply in range(50):
        for p in (0, 1):
            assert float(score_f(jnp.asarray(state), p)) == float(
                board.get_score(p))
        assert int(spec.get_round(jnp.asarray(state))) == int(
            board.get_round())
        v = np.asarray(board.valid_moves(0), bool)
        a = int(rng.choice(np.flatnonzero(v)))
        board.copy_state(state, True)
        nxt = board.make_move(a, 0, random_seed=2)
        if nxt != 0:
            board.swap_players(nxt)
        st2, _ = step_f(jnp.asarray(state), a, 2)
        state = np.asarray(st2)

    # batched stepping smoke: 8 lanes, true-random chance
    B = 8
    states = jax.vmap(spec.init)(jax.random.split(jax.random.PRNGKey(0), B))
    vv = jax.jit(jax.vmap(spec.valids))
    vstep = jax.jit(jax.vmap(lambda s, a, k: spec.step_canonical(
        s, a, k, jnp.int32(0))))
    for ply in range(30):
        v = np.asarray(vv(states))
        acts = jnp.asarray([int(rng.choice(np.flatnonzero(v[b])))
                            for b in range(B)])
        states, _ = vstep(states, acts,
                          jax.random.split(jax.random.PRNGKey(ply), B))
    st = np.asarray(states)
    # tile conservation: bag+discards+centre+factories+lines+walls == 100
    total = (st[:, 1, :5].sum(1) + st[:, 2, :5].sum(1) + st[:, 3, :5].sum(1)
             + st[:, 4:9, :5].sum((1, 2))
             + st[:, 11:13, :5].sum((1, 2))           # pattern-line tiles
             + st[:, 13:23, :5].sum((1, 2)))          # wall tiles
    assert (total == 100).all(), total
