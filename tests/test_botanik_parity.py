"""Parity of the JAX Botanik engine vs the upstream reference.

The oracle draws cards via inverse-CDF on np.random.random()
(BotanikLogicNumba.py:112-115).  Each ply we pre-script up to three uniform
values that select known ranks among the available cards, and feed the same
ranks to our engine through the base-66 seed encoding (games/botanik.py).
The initial 8 draws are true-random: the oracle board is built under a fixed
numpy seed and its state copied into our engine (layouts are identical).
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
        if m.startswith("botanik"):
            del sys.modules[m]
    import botanik.BotanikLogicNumba as L
    return L


@pytest.fixture(scope="module")
def spec():
    return make_game("botanik")


class RandomScript:
    def __init__(self):
        self.queue = []
        self.orig = np.random.random

    def __call__(self, *a, **k):
        if self.queue and not a and not k:
            return self.queue.pop(0)
        return self.orig(*a, **k)


def bitfield_count(state):
    """Number of available cards in the deck bitfield (misc rows 3,4)."""
    hi = state[0, 3, :5].astype(np.int64) % 256
    lo = state[0, 4, :5].astype(np.int64) % 256
    vals = hi * 256 + lo
    return int(sum(bin(v).count("1") for v in vals))


@pytest.mark.parametrize("game_seed", range(4))
def test_full_game_parity(spec, oracle_mod, game_seed):
    rng = np.random.default_rng(game_seed)
    np.random.seed(game_seed)
    board = oracle_mod.Board(2)
    state = np.array(board.get_state(), copy=True)

    script = RandomScript()
    np.random.random = script
    valids_f = jax.jit(spec.valids)
    terminal_f = jax.jit(spec.terminal)
    step_f = jax.jit(lambda s, a, seed: spec.step_canonical(
        s, jnp.asarray(a, jnp.int32), jax.random.PRNGKey(0),
        jnp.asarray(seed, jnp.int32)))
    try:
        for ply in range(spec.max_game_length):
            v_ref = np.asarray(board.valid_moves(0), bool)
            v_jax = np.asarray(valids_f(jnp.asarray(state)))
            np.testing.assert_array_equal(
                v_jax, v_ref, err_msg=f"valids diverge at ply {ply}")
            t_ref = np.asarray(board.check_end_game(0), np.float32)
            t_jax = np.asarray(terminal_f(jnp.asarray(state)))
            np.testing.assert_allclose(
                t_jax, t_ref, atol=1e-7,
                err_msg=f"terminal diverges at ply {ply}")
            if t_ref.any():
                return

            action = int(rng.choice(np.flatnonzero(v_ref)))
            # script a possible 3-card refill with known ranks
            count = bitfield_count(state)
            ranks = [int(rng.integers(0, max(count - i, 1)))
                     if count - i > 0 else 0 for i in range(3)]
            script.queue = [(r + 0.5) / max(count - i, 1)
                            for i, r in enumerate(ranks)]
            seed = 1 + ranks[0] + 66 * ranks[1] + 66 * 66 * ranks[2]

            board.copy_state(board.get_state(), True)
            nxt = board.make_move(action, 0, random_seed=0)
            if nxt != 0:
                board.swap_players(nxt)
            st, swap = step_f(jnp.asarray(state), action, seed)
            state = np.asarray(st)
            assert int(swap) == nxt, f"ply {ply}: swap {int(swap)} != {nxt}"
            np.testing.assert_array_equal(
                state, board.get_state(),
                err_msg=f"state diverges after ply {ply} action {action}")
        pytest.fail("game did not terminate")
    finally:
        np.random.random = script.orig


def test_init_structure(spec):
    state = np.asarray(spec.init(jax.random.PRNGKey(1)))
    # source cards in both machines at (2,3)
    from alphazero_tpu.games.botanik import (
        R_M0, R_M1, NB_ROWS, M, SRC_Y, SRC_X, SOURCE_CARD)
    for r0 in (R_M0, R_M1):
        mach = state[r0:r0 + NB_ROWS].reshape(-1)[:M * M * 7] \
            .reshape(M, M, 7)
        np.testing.assert_array_equal(mach[SRC_Y, SRC_X], SOURCE_CARD)
        assert (mach[:, :, 0] != 0).sum() == 1
    # 5 middle + 3 arrival cards drawn, 57 left in deck
    assert (state[4, :, 0] != 0).all()
    assert (state[1, :3, 0] != 0).all()
    assert bitfield_count(state) == 65 - 8
    # scores zero, status PUT, round 0
    assert state[0, 1, 0] == 0 and state[0, 1, 1] == 0
    assert state[0, 0, 1] == 0 and state[0, 0, 0] == 0


def test_random_game_terminates_and_scores(spec):
    rng = np.random.default_rng(7)
    state = spec.init(jax.random.PRNGKey(7))
    step_f = jax.jit(lambda s, a, k: spec.step_canonical(
        s, a, k, jnp.int32(0)))
    for ply in range(spec.max_game_length):
        t = np.asarray(spec.terminal(state))
        if t.any():
            assert abs(float(spec.get_score(state, jnp.int32(0)))) < 127
            return
        v = np.asarray(spec.valids(state))
        assert v.any(), f"no valid moves at ply {ply}"
        a = jnp.int32(int(rng.choice(np.flatnonzero(v))))
        state, _ = step_f(state, a, jax.random.PRNGKey(1000 + ply))
    pytest.fail("game did not terminate")


def test_symmetries_consistency(spec):
    """Each symmetric variant must keep pi mass and stay mask-consistent."""
    rng = np.random.default_rng(3)
    state = spec.init(jax.random.PRNGKey(3))
    step_f = jax.jit(lambda s, a, k: spec.step_canonical(
        s, a, k, jnp.int32(0)))
    for ply in range(20):
        v = np.asarray(spec.valids(state))
        a = jnp.int32(int(rng.choice(np.flatnonzero(v))))
        state, _ = step_f(state, a, jax.random.PRNGKey(ply))
    v = spec.valids(state)
    pi = v.astype(jnp.float32) / jnp.sum(v)
    sts, pis, vas = spec.symmetries(state, pi, v)
    assert sts.shape[0] == spec.num_symmetries
    np.testing.assert_array_equal(np.asarray(sts[0]), np.asarray(state))
    for k in range(spec.num_symmetries):
        np.testing.assert_allclose(float(jnp.sum(pis[k])), 1.0, atol=1e-5,
                                   err_msg=f"sym {k}")
        # pi support inside the mask
        assert not np.any((np.asarray(pis[k]) > 0) & ~np.asarray(vas[k]))
        # variant state's own valid moves equal the permuted mask
        v_k = np.asarray(spec.valids(sts[k]))
        np.testing.assert_array_equal(v_k, np.asarray(vas[k]),
                                      err_msg=f"sym {k} mask")
