"""Parity of the JAX The Little Prince engine vs the upstream reference.

Market-refill draws are captured from the oracle (rank among available items
per draw) and injected into our engine via the seed encoding
(seed = 1 + sum(rank_j << 5j))."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alphazero_tpu.games import make_game
from tests.reference_oracle import install_numba_stub, REFERENCE_PATH

N = 3


@pytest.fixture(scope="module")
def oracle_mod():
    import sys
    install_numba_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    for m in list(sys.modules):
        if m.startswith("thelittleprince"):
            del sys.modules[m]
    import thelittleprince.TLPLogicNumba as L
    return L


@pytest.fixture(scope="module")
def spec():
    return make_game("thelittleprince", num_players=N)


class DrawRecorder:
    """Wrap the oracle's choice fn to record the rank of each pick among
    the available items."""

    def __init__(self, L):
        self.L = L
        self.orig = L.my_random_choice_and_normalize
        self.ranks = []

    def install(self):
        rec = self

        def wrapper(prob):
            idx = rec.orig(prob)
            rank = int(np.asarray(prob[:idx]).astype(bool).sum())
            rec.ranks.append(rank)
            return idx

        self.L.my_random_choice_and_normalize = wrapper
        # the Board class body closes over the module global at call time
        return self

    def uninstall(self):
        self.L.my_random_choice_and_normalize = self.orig

    def seed(self):
        s = 0
        for j, r in enumerate(self.ranks):
            assert r < 32
            s |= r << (5 * j)
        return s + 1


@pytest.mark.parametrize("game_seed", range(5))
def test_full_game_parity(spec, oracle_mod, game_seed):
    rng = np.random.default_rng(game_seed)
    rec = DrawRecorder(oracle_mod).install()
    try:
        np.random.seed(game_seed)
        board = oracle_mod.Board(N)
        state = np.array(board.get_state(), copy=True)

        valids_f = jax.jit(spec.valids)
        terminal_f = jax.jit(spec.terminal)
        step_f = jax.jit(lambda s, a, seed: spec.step_canonical(
            s, jnp.asarray(a, jnp.int32), jax.random.PRNGKey(0),
            jnp.asarray(seed, jnp.int32)))
        score_f = jax.jit(spec.get_score)

        for ply in range(spec.max_game_length):
            v_ref = np.asarray(board.valid_moves(0), bool)
            v_jax = np.asarray(valids_f(jnp.asarray(state)))
            np.testing.assert_array_equal(
                v_jax, v_ref, err_msg=f"valids diverge at ply {ply}")
            t_ref = np.asarray(board.check_end_game(), np.float32)
            t_jax = np.asarray(terminal_f(jnp.asarray(state)))
            np.testing.assert_allclose(t_jax, t_ref, atol=1e-7,
                                       err_msg=f"terminal at ply {ply}")
            for p in range(N):
                assert float(score_f(jnp.asarray(state), p)) == float(
                    board.get_score(p)), f"score ply {ply}"
            if t_ref.any():
                return

            action = int(rng.choice(np.flatnonzero(v_ref)))
            rec.ranks.clear()
            board.copy_state(board.get_state(), True)
            nxt = board.make_move(action, 0, random_seed=0)
            seed = rec.seed()
            if nxt != 0:
                board.swap_players(nxt)
            st, swap = step_f(jnp.asarray(state), action, seed)
            state = np.asarray(st)
            assert int(swap) == nxt, f"ply {ply}: swap {int(swap)} != {nxt}"
            np.testing.assert_array_equal(
                state, board.get_state(),
                err_msg=f"state diverges after ply {ply} action {action} "
                        f"ranks {rec.ranks}")
        pytest.fail("game did not terminate")
    finally:
        rec.uninstall()


def test_symmetry_market_permutations(spec, oracle_mod):
    """Our fixed market permutations must be genuine symmetries: permuted
    state + permuted policy must produce consistently permuted valid moves."""
    np.random.seed(1)
    board = oracle_mod.Board(N)
    state = jnp.asarray(np.array(board.get_state(), copy=True))
    pi = np.random.rand(spec.num_actions).astype(np.float32)
    v = np.asarray(spec.valids(state))
    st, pis, vas = map(np.asarray,
                       spec.symmetries(state, jnp.asarray(pi * v),
                                       jnp.asarray(v)))
    assert st.shape[0] == spec.num_symmetries == 6
    for i in range(st.shape[0]):
        v_direct = np.asarray(spec.valids(jnp.asarray(st[i])))
        np.testing.assert_array_equal(v_direct, vas[i],
                                      err_msg=f"perm {i} valids inconsistent")
