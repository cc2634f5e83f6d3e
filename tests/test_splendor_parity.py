"""Bit-exact parity of the JAX Splendor engine vs the upstream reference,
including the deterministic chance path (deck draws via the per-universe LCG).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alphazero_tpu.config import MAGIC_SEEDS
from alphazero_tpu.games import make_game
from tests.reference_oracle import import_reference_splendor


@pytest.fixture(scope="module")
def spec():
    return make_game("splendor", num_players=2)


@pytest.fixture(scope="module")
def oracle_mod():
    return import_reference_splendor(num_players=2)


@pytest.fixture(scope="module")
def jitted(spec):
    valids = jax.jit(spec.valids)
    terminal = jax.jit(spec.terminal)

    def step_c(state, a, seed):
        return spec.step_canonical(state, jnp.asarray(a, jnp.int32),
                                   jax.random.PRNGKey(0),
                                   jnp.asarray(seed, jnp.int32))

    return valids, terminal, jax.jit(step_c)


def oracle_board(L, np_seed=0):
    np.random.seed(np_seed)
    return L.Board(2)


def test_data_tables_match(oracle_mod):
    """Our standalone card data must equal the reference tables."""
    from alphazero_tpu.games import splendor_data as D
    import splendor.SplendorLogic as SL
    np.testing.assert_array_equal(D.NOBLES, SL.np_all_nobles)
    np.testing.assert_array_equal(D.CARDS_TIER1, SL.np_all_cards_1)
    np.testing.assert_array_equal(D.CARDS_TIER2, SL.np_all_cards_2)
    np.testing.assert_array_equal(D.CARDS_TIER3, SL.np_all_cards_3)
    np.testing.assert_array_equal(D.GEMS_UP_TO_3, SL.np_different_gems_up_to_3)
    np.testing.assert_array_equal(D.GEMS_UP_TO_2, SL.np_different_gems_up_to_2)


@pytest.mark.parametrize("game_seed", range(6))
def test_full_game_parity_deterministic_chance(spec, oracle_mod, jitted,
                                               game_seed):
    """Random playthroughs with seed-driven chance: valid moves, terminal
    vectors, and post-move states must match byte-for-byte, including deck
    draws through the reference LCG."""
    valids_f, terminal_f, step_f = jitted
    rng = np.random.default_rng(game_seed)

    board = oracle_board(oracle_mod, np_seed=game_seed)
    # start both engines from the oracle's (randomly initialized) state
    state = np.array(board.get_state(), copy=True)

    for ply in range(spec.max_game_length):
        v_ref = np.asarray(board.valid_moves(0), dtype=bool)
        v_jax = np.asarray(valids_f(jnp.asarray(state)))
        np.testing.assert_array_equal(
            v_jax, v_ref, err_msg=f"valid moves diverge at ply {ply}")

        t_ref = np.asarray(board.check_end_game(), dtype=np.float32)
        t_jax = np.asarray(terminal_f(jnp.asarray(state)))
        np.testing.assert_allclose(
            t_jax, t_ref, atol=1e-7,
            err_msg=f"terminal vector diverges at ply {ply}")
        if t_ref.any():
            return

        action = int(rng.choice(np.flatnonzero(v_ref)))
        seed = int(MAGIC_SEEDS[ply % len(MAGIC_SEEDS)])

        board.copy_state(board.get_state(), True)
        nxt_player = board.make_move(action, 0, random_seed=seed)
        if nxt_player != 0:
            board.swap_players(nxt_player)
        s_ref = board.get_state()

        nxt, swap = step_f(jnp.asarray(state), action, seed)
        state = np.asarray(nxt)
        assert int(swap) == nxt_player
        np.testing.assert_array_equal(
            state, s_ref,
            err_msg=f"state diverges after ply {ply} action {action} "
                    f"seed {seed}")

    pytest.fail("game did not terminate within max_game_length")


def test_scores_and_round(spec, oracle_mod, jitted):
    valids_f, terminal_f, step_f = jitted
    rng = np.random.default_rng(11)
    board = oracle_board(oracle_mod, np_seed=11)
    state = np.array(board.get_state(), copy=True)
    score_f = jax.jit(spec.get_score)
    round_f = jax.jit(spec.get_round)

    for ply in range(40):
        for p in (0, 1):
            assert float(score_f(jnp.asarray(state), p)) == float(
                board.get_score(p))
        assert int(round_f(jnp.asarray(state))) == int(board.get_round())
        v = np.asarray(board.valid_moves(0), bool)
        a = int(rng.choice(np.flatnonzero(v)))
        board.copy_state(board.get_state(), True)
        nxt = board.make_move(a, 0, random_seed=7)
        if nxt != 0:
            board.swap_players(nxt)
        state2, _ = step_f(jnp.asarray(state), a, 7)
        state = np.asarray(state2)


def test_symmetries_parity(spec, oracle_mod, jitted):
    valids_f, _, step_f = jitted
    rng = np.random.default_rng(5)
    board = oracle_board(oracle_mod, np_seed=5)
    state = np.array(board.get_state(), copy=True)
    sym_f = jax.jit(spec.symmetries)

    for ply in range(25):
        v = np.asarray(board.valid_moves(0), bool)
        pi = rng.random(spec.num_actions).astype(np.float32) * v
        pi /= pi.sum()

        board.copy_state(state.copy(), False)
        ref_syms = board.get_symmetries(pi.copy(), v.copy())
        st, pis, vas = sym_f(jnp.asarray(state), jnp.asarray(pi),
                             jnp.asarray(v))
        st, pis, vas = np.asarray(st), np.asarray(pis), np.asarray(vas)

        # ours is fixed-size with identity fallbacks; every reference
        # symmetry must appear among ours, and ours must contain nothing
        # that is not a reference symmetry or the identity
        ref_keys = {(rs.tobytes(), rp.astype(np.float32).tobytes())
                    for rs, rp, _ in ref_syms}
        my_keys = {(st[i].tobytes(), pis[i].astype(np.float32).tobytes())
                   for i in range(st.shape[0])}
        missing = ref_keys - my_keys
        assert not missing, f"ply {ply}: missing {len(missing)} ref symmetries"
        identity = (state.tobytes(), pi.astype(np.float32).tobytes())
        extra = my_keys - ref_keys - {identity}
        assert not extra, f"ply {ply}: {len(extra)} non-reference symmetries"

        board.copy_state(state, True)
        a = int(rng.choice(np.flatnonzero(v)))
        nxt = board.make_move(a, 0, random_seed=3)
        if nxt != 0:
            board.swap_players(nxt)
        state2, _ = step_f(jnp.asarray(state), a, 3)
        state = np.asarray(state2)
        np.testing.assert_array_equal(state, board.get_state())


def test_true_random_chance_stays_legal(spec):
    """seed=0 path: stepping with PRNG-keyed chance keeps the state legal
    (deck counts consistent with bitfields, gem conservation)."""
    B = 16
    key = jax.random.PRNGKey(0)
    states = jax.vmap(spec.init)(jax.random.split(key, B))
    vstep = jax.jit(jax.vmap(
        lambda s, a, k: spec.step_canonical(s, a, k, jnp.int32(0))))
    vval = jax.jit(jax.vmap(spec.valids))
    vterm = jax.jit(jax.vmap(spec.terminal))
    rng = np.random.default_rng(0)

    total_gems_start = np.asarray(states)[:, [0, 34, 35], :6].sum()
    for ply in range(60):
        t = np.asarray(vterm(states))
        v = np.array(vval(states))
        if t.any(-1).all():
            break
        acts = []
        for b in range(B):
            acts.append(int(rng.choice(np.flatnonzero(v[b]))) if v[b].any()
                        else 80)
        keys = jax.random.split(jax.random.fold_in(key, ply), B)
        states, _ = vstep(states, jnp.asarray(acts), keys)
        st = np.asarray(states)
        # gem conservation: bank + players constant (cols 0-5)
        np.testing.assert_equal(st[:, [0, 34, 35], :6].sum(),
                                total_gems_start)
        # deck bitfield popcount == deck count
        for tier in range(3):
            counts = st[:, 25 + 2 * tier, :5].astype(np.int32)
            bits = st[:, 26 + 2 * tier, :5].astype(np.uint8)
            pop = np.unpackbits(bits[..., None], axis=-1).sum(-1)
            np.testing.assert_array_equal(pop, counts)
