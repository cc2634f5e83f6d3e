"""Cross-move tree reuse parity vs the reference's persistent MCTS.

The reference keeps one node dict across every move of an episode
(/root/reference/MCTS.py:39-47; GC at :85-91; reset only between arena
games, Arena.py:99), so the second move's search starts from the chosen
child's statistics.  Here: search S1 sims -> step the chosen action ->
extract_subtree -> search S2 sims with init_tree, and the visit counts must
match a reference MCTS object that lived through both calls.

Caveat shared with the other search-parity tests: the reference's dict is a
transposition TABLE — cross-branch states unify there but not in an array
tree.  Positions/sim counts are chosen shallow enough that no transposition
is hit (asserted indirectly by exact equality).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alphazero_tpu.config import MCTSConfig
from alphazero_tpu.games import make_game
from alphazero_tpu.search.mcts import mcts_search
from alphazero_tpu.search.tree import extract_subtree
from tests.test_mcts_parity import (FakeNNet, fake_eval_jax, make_positions,
                                    ref_env, spec)  # noqa: F401  (fixtures)

S1, S2 = 24, 24


def run_reference_two_moves(ref_env, state, cfg, action):
    _, MCTSmod, SG = ref_env
    import sys
    sys.path.insert(0, "/root/reference")
    from utils import dotdict

    game = SG.SantoriniGame()
    args = dotdict(dict(
        numMCTSSims=S1, prob_fullMCTS=1.0, ratio_fullMCTS=1,
        forced_playouts=False, universes=1, cpuct=cfg.cpuct, fpu=cfg.fpu,
        dirichletAlpha=0.0, temperature=[1.0, 0.1, 1.0], no_mem_optim=True))
    mcts = MCTSmod.MCTS(game, FakeNNet(), args, dirichlet_noise=False)
    probs1, _, _ = mcts.getActionProb(state.copy(), temp=1.0,
                                      force_full_search=True)
    # play `action`, canonicalize, search again with the SAME mcts object
    nxt, nxt_player = game.getNextState(state.copy(), 0, action,
                                        random_seed=0)
    canon = game.getCanonicalForm(nxt, nxt_player)
    mcts.args = dotdict(dict(args, numMCTSSims=S2))
    probs2, q2, _ = mcts.getActionProb(canon.copy(), temp=1.0,
                                       force_full_search=True)
    return (np.asarray(probs1, np.float64), np.asarray(probs2, np.float64),
            canon)


def test_reuse_matches_reference_persistent_mcts(spec, ref_env):  # noqa: F811
    cfg = MCTSConfig(num_sims=S1, cpuct=1.25, fpu=0.0, universes=1,
                     q_dtype="float64", prior_dtype="float32")
    positions = make_positions(spec, n_pos=3, plies=6)
    states = jnp.asarray(np.stack(positions))
    B = states.shape[0]
    nb = jnp.zeros((B,), bool)

    out1, trees1 = jax.jit(
        lambda s, k: mcts_search(
            spec, fake_eval_jax, None, s, k,
            jnp.full((B,), S1, jnp.int32), nb, nb,
            cfg=cfg, num_sims_max=S1, use_noise=False))(
        states, jax.random.PRNGKey(0))

    actions = np.asarray(jnp.argmax(out1.counts, axis=-1))
    # step each lane's chosen action
    nxt_states, _ = jax.jit(jax.vmap(
        lambda s, a: spec.step_canonical(s, a, jax.random.PRNGKey(0),
                                         jnp.int32(0))))(
        states, jnp.asarray(actions, jnp.int32))

    # re-root: arena for move 2 = S2 sims + carried subtree
    extra = S1  # subtree can hold at most S1 nodes
    sub, ok = jax.jit(lambda t, a: extract_subtree(
        t, a, S2 + 1 + extra))(trees1, jnp.asarray(actions, jnp.int32))
    ok = np.asarray(ok)
    assert ok.all(), "chosen children should be interior after 24 sims"

    out2, _ = jax.jit(
        lambda s, k, it, rm: mcts_search(
            spec, fake_eval_jax, None, s, k,
            jnp.full((B,), S2, jnp.int32), nb, nb,
            cfg=cfg, num_sims_max=S2, use_noise=False,
            init_tree=it, reuse_mask=rm, extra_nodes=extra))(
        nxt_states, jax.random.PRNGKey(1), sub, jnp.asarray(ok))

    counts2 = np.asarray(out2.counts)
    probs2 = counts2 / counts2.sum(-1, keepdims=True)

    for i, pos in enumerate(positions):
        ref_p1, ref_p2, ref_canon = run_reference_two_moves(
            ref_env, pos, cfg, int(actions[i]))
        np.testing.assert_array_equal(np.asarray(nxt_states[i]), ref_canon)
        np.testing.assert_allclose(
            probs2[i], ref_p2, atol=1e-12,
            err_msg=f"reused visit policy diverges at position {i}")


@pytest.mark.slow
def test_extract_subtree_preserves_stats(spec):  # noqa: F811
    """Structural invariants: the new root carries the old child's row."""
    cfg = MCTSConfig(num_sims=16, q_dtype="float64")
    positions = make_positions(spec, n_pos=2, plies=4)
    states = jnp.asarray(np.stack(positions))
    B = states.shape[0]
    nb = jnp.zeros((B,), bool)
    out, trees = jax.jit(
        lambda s, k: mcts_search(
            spec, fake_eval_jax, None, s, k,
            jnp.full((B,), 16, jnp.int32), nb, nb,
            cfg=cfg, num_sims_max=16, use_noise=False))(
        states, jax.random.PRNGKey(3))
    actions = jnp.argmax(out.counts, axis=-1).astype(jnp.int32)
    sub, ok = extract_subtree(trees, actions, 40)
    ok = np.asarray(ok)
    bidx = np.arange(B)
    old_child = np.asarray(trees.children)[bidx, 0, np.asarray(actions)]
    for b in range(B):
        if not ok[b]:
            continue
        c = int(old_child[b])
        assert c >= 1
        # new root row == old child row
        np.testing.assert_array_equal(np.asarray(sub.states)[b, 0],
                                      np.asarray(trees.states)[b, c])
        assert (np.asarray(sub.n_visit)[b, 0]
                == np.asarray(trees.n_visit)[b, c])
        np.testing.assert_allclose(np.asarray(sub.qs)[b, 0],
                                   np.asarray(trees.qs)[b, c])
        # compacted size is consistent and <= old arena
        size = int(np.asarray(sub.next_free)[b])
        assert 1 <= size <= int(np.asarray(trees.next_free)[b])
        # all interior children codes point inside the compacted arena
        ch = np.asarray(sub.children)[b, :size]
        assert ch.max(initial=-1) < size


def test_arena_reuse_flag_runs(spec):  # noqa: F811
    """play_matches(reuse_tree=True) completes and scores games."""
    from alphazero_tpu.config import NetConfig
    from alphazero_tpu.models import init_params, make_net
    from alphazero_tpu.train.arena import play_matches
    net = make_net(spec, NetConfig(version=1, channels=16, depth=1))
    params = init_params(net, spec, jax.random.PRNGKey(0))
    res = play_matches(spec, net, params, params, jax.random.PRNGKey(1),
                       cfg=MCTSConfig(num_sims=8), num_games=4,
                       reuse_tree=True)
    total = (int(res.one_wins) + int(res.two_wins) + int(res.draws)
             + int(res.unfinished))
    assert total == 4
    assert int(res.unfinished) == 0
