"""Parity of the JAX Minivilles engine vs the upstream reference.

Dice are injected: the oracle's np.random.randint is patched to scripted
values and the same dice are fed to our engine through the exact-dice seed
encoding (seed = d1 + 5*(d2-1), see games/minivilles.py)."""

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
        if m.startswith("minivilles"):
            del sys.modules[m]
    import minivilles.MinivillesLogicNumba as L
    return L


@pytest.fixture(scope="module")
def spec():
    return make_game("minivilles", num_players=2)


class DiceScript:
    """Patch np.random.randint with scripted dice values."""

    def __init__(self):
        self.queue = []
        self.orig = np.random.randint

    def set(self, d1, d2):
        self.queue = [d1, d2]

    def __call__(self, lo, hi=None, *a, **k):
        if hi == 6 and lo == 1 and self.queue:
            return self.queue.pop(0)
        return self.orig(lo, hi, *a, **k)


@pytest.mark.parametrize("game_seed", range(5))
def test_full_game_parity(spec, oracle_mod, game_seed):
    rng = np.random.default_rng(game_seed)
    script = DiceScript()
    np.random.randint = script
    try:
        np.random.seed(game_seed)
        board = oracle_mod.Board(2)
        state = np.array(board.get_state(), copy=True)

        valids_f = jax.jit(spec.valids)
        terminal_f = jax.jit(spec.terminal)
        step_f = jax.jit(lambda s, a, seed: spec.step_canonical(
            s, jnp.asarray(a, jnp.int32), jax.random.PRNGKey(0),
            jnp.asarray(seed, jnp.int32)))

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
            d1, d2 = int(rng.integers(1, 6)), int(rng.integers(1, 6))
            seed = d1 + 5 * (d2 - 1)       # exact-dice encoding
            script.set(d1, d2)

            board.copy_state(board.get_state(), True)
            nxt = board.make_move(action, 0, random_seed=0)
            if nxt != 0:
                board.swap_players(nxt)
            st, swap = step_f(jnp.asarray(state), action, seed)
            state = np.asarray(st)
            assert int(swap) == nxt, f"ply {ply}: swap {int(swap)} != {nxt}"
            np.testing.assert_array_equal(
                state, board.get_state(),
                err_msg=f"state diverges after ply {ply} action {action} "
                        f"dice {d1},{d2}")
        pytest.fail("game did not terminate")
    finally:
        np.random.randint = script.orig


def test_play_again_semantics(spec, oracle_mod):
    """Doubles with the train station must keep the same player (swap 0)."""
    script = DiceScript()
    np.random.randint = script
    try:
        np.random.seed(0)
        board = oracle_mod.Board(2)
        state = np.array(board.get_state(), copy=True)
        # give player 0 a train station and money via direct state surgery
        state[18, 0] = 20                  # money P0
        state[18 + 2 + 15 * 2 + 0, 0] = 0
        s = jnp.asarray(state)
        step_f = jax.jit(lambda s, a, seed: spec.step_canonical(
            s, jnp.asarray(a, jnp.int32), jax.random.PRNGKey(0),
            jnp.asarray(seed, jnp.int32)))
        # buy the train station (monument 0, action 15)
        v = np.asarray(spec.valids(s))
        assert v[15]
        s, swap = step_f(s, 15, 3 + 5 * (3 - 1))   # dice 3,3 for opponent
        # opponent has no station -> single die, no doubles; next is P0 again
        assert int(swap) == 1
    finally:
        np.random.randint = script.orig


def test_true_random_game_terminates(spec):
    B = 8
    states = jax.vmap(spec.init)(jax.random.split(jax.random.PRNGKey(0), B))
    vv = jax.jit(jax.vmap(spec.valids))
    vt = jax.jit(jax.vmap(spec.terminal))
    vstep = jax.jit(jax.vmap(lambda s, a, k: spec.step_canonical(
        s, a, k, jnp.int32(0))))
    rng = np.random.default_rng(0)
    done = np.zeros(B, bool)
    for ply in range(spec.max_game_length):
        done |= np.asarray(vt(states)).any(-1)
        if done.all():
            break
        v = np.asarray(vv(states))
        acts = jnp.asarray([int(rng.choice(np.flatnonzero(v[b])))
                            for b in range(B)])
        states, _ = vstep(states, acts,
                          jax.random.split(jax.random.PRNGKey(ply), B))
    # money clamps keep everything in int8 range and games end by cap
    st = np.asarray(states)
    assert (st[:, 18:20, 0] >= 0).all()
