"""Learner, arena, checkpoint and multi-chip sharding tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alphazero_tpu.config import (Config, GameConfig, MCTSConfig, NetConfig,
                                  SelfPlayConfig, TrainConfig)
from alphazero_tpu.games import make_game
from alphazero_tpu.models import (init_params, make_net, param_count,
                                  transfer_params)
from alphazero_tpu.train.arena import play_matches
from alphazero_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from alphazero_tpu.train.learner import (evaluate_loss, init_train_state,
                                         loss_pi, loss_v, train_step)


@pytest.fixture(scope="module")
def setup():
    spec = make_game("santorini", nb_gods=1, init_method=1)
    net = make_net(spec, NetConfig(version=1, channels=16, depth=1))
    params = init_params(net, spec, jax.random.PRNGKey(0))
    return spec, net, params


def fake_batch(spec, B, seed=0):
    rng = np.random.default_rng(seed)
    states = np.asarray(jax.vmap(spec.init)(
        jax.random.split(jax.random.PRNGKey(seed), B)))
    valids = np.asarray(jax.vmap(spec.valids)(jnp.asarray(states)))
    pi = rng.random((B, spec.num_actions)).astype(np.float32) * valids
    pi /= pi.sum(-1, keepdims=True)
    z = np.tile(np.array([[1.0, -1.0]], np.float32), (B, 1))
    q = np.tile(np.array([[0.3, -0.3]], np.float32), (B, 1))
    return {k: jnp.asarray(v) for k, v in
            dict(state=states, pi=pi, z=z, q=q, valids=valids).items()}


def test_losses_match_torch_semantics():
    """KLDiv(batchmean) and MSE normalized by B*P
    (reference GenericNNetWrapper.py:179-190)."""
    p = jnp.asarray([[0.5, 0.5, 0.0], [1.0, 0.0, 0.0]])
    logq = jnp.log(jnp.asarray([[0.25, 0.25, 0.5], [0.5, 0.25, 0.25]]))
    expected = (0.5 * np.log(0.5 / 0.25) * 2 + np.log(1 / 0.5)) / 2
    np.testing.assert_allclose(float(loss_pi(p, logq)), expected, rtol=1e-6)

    z = jnp.asarray([[1.0, -1.0]])
    q = jnp.asarray([[0.0, 0.0]])
    v = jnp.asarray([[0.5, -0.5]])
    # target = (z + 0.5*q)/1.5 = (2/3, -2/3); mse = 2*(1/6)^2 / (1*2)
    np.testing.assert_allclose(float(loss_v(z, q, v, 0.5)),
                               (1 / 6) ** 2, rtol=1e-5)


def test_train_step_reduces_loss(setup):
    spec, net, params = setup
    cfg = TrainConfig(learn_rate=3e-3, batch_size=32, epochs=1)
    state = init_train_state(params, cfg, total_steps=60)
    batch = fake_batch(spec, 32)
    first = None
    for i in range(60):
        state, m = train_step(spec, net, cfg, 60, state, batch,
                              jax.random.PRNGKey(i), augment=False)
        if first is None:
            first = float(m.loss)
    assert float(m.loss) < first * 0.7, (first, float(m.loss))
    assert np.isfinite(float(m.loss))


def test_symmetry_augment_runs(setup):
    spec, net, params = setup
    cfg = TrainConfig(batch_size=16)
    state = init_train_state(params, cfg, total_steps=4)
    batch = fake_batch(spec, 16)
    state, m = train_step(spec, net, cfg, 4, state, batch,
                          jax.random.PRNGKey(0), augment=True)
    assert np.isfinite(float(m.loss))
    assert np.isfinite(float(evaluate_loss(spec, net, state.params, batch)))


def test_arena_self_match_balanced(setup):
    """Identical params with alternating seating should be roughly balanced
    and all games must finish."""
    spec, net, params = setup
    res = play_matches(spec, net, params, params, jax.random.PRNGKey(3),
                       cfg=MCTSConfig(num_sims=12), num_games=32)
    total = int(res.one_wins) + int(res.two_wins) + int(res.draws)
    assert total == 32
    assert int(res.unfinished) == 0
    assert int(res.draws) == 0  # no draws in no-gods Santorini
    assert 6 <= int(res.one_wins) <= 26


def _host_runner_check(setup, reuse):
    """The host move-loop runner completes every game and lands in the same
    statistical regime as the scan runner (bitwise equality is NOT expected:
    XLA compiles the standalone per-move program with different float
    reassociation than the scan body, which can flip near-tie moves)."""
    from alphazero_tpu.train.arena import play_matches_host
    spec, net, params = setup
    res = play_matches_host(spec, net, params, params, jax.random.PRNGKey(3),
                            cfg=MCTSConfig(num_sims=12), num_games=8,
                            reuse_tree=reuse)
    total = int(res.one_wins) + int(res.two_wins) + int(res.draws)
    assert total == 8, (reuse, res)
    assert int(res.unfinished) == 0
    assert 1 <= int(res.one_wins) <= 7


def test_arena_host_runner(setup):
    _host_runner_check(setup, reuse=False)


def test_arena_dyn_runner_bitexact(setup):
    """The dynamic (while_loop + all-done early-exit) arena runner is
    bit-exact with the scan runner: identical per-ply RNG stream, frozen
    lanes never change, and the early exit only skips no-op plies."""
    import dataclasses

    from alphazero_tpu.train.arena import play_matches_dyn
    spec, net, params = setup
    for mc in (MCTSConfig(num_sims=12),
               MCTSConfig(num_sims=12, dyn_sims=True)):
        ref = play_matches(spec, net, params, params, jax.random.PRNGKey(3),
                           cfg=dataclasses.replace(mc, dyn_sims=False),
                           num_games=16)
        got = play_matches_dyn(spec, net, params, params,
                               jax.random.PRNGKey(3), cfg=mc, num_games=16)
        assert (int(got.one_wins), int(got.two_wins), int(got.draws),
                int(got.unfinished)) == \
               (int(ref.one_wins), int(ref.two_wins), int(ref.draws),
                int(ref.unfinished)), mc.dyn_sims


@pytest.mark.slow
def test_arena_host_runner_reuse(setup):
    _host_runner_check(setup, reuse=True)


def test_checkpoint_roundtrip(setup, tmp_path):
    spec, net, params = setup
    cfg = Config(game=GameConfig(name="santorini",
                                 variant=dict(nb_gods=1, init_method=1)))
    path = str(tmp_path / "best")
    save_checkpoint(path, params, cfg, meta=dict(iteration=7))
    loaded, cfg2, meta, transferred = load_checkpoint(path, params)
    assert not transferred
    assert meta["iteration"] == 7
    assert cfg2.game.name == "santorini"
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_knowledge_transfer_crop(setup, tmp_path):
    """Loading into a wider net must crop-copy overlapping slices
    (reference GenericNNetWrapper.py:222-277)."""
    spec, net, params = setup
    cfg = Config()
    path = str(tmp_path / "old")
    save_checkpoint(path, params, cfg)

    wide = make_net(spec, NetConfig(version=1, channels=32, depth=1))
    wide_params = init_params(wide, spec, jax.random.PRNGKey(9))
    loaded, _, _, transferred = load_checkpoint(path, wide_params)
    assert transferred
    assert param_count(loaded) == param_count(wide_params)
    # shapes must match the wide net everywhere, and at least one overlapping
    # slice must carry the old values
    copied_any = False
    for (ka, a), (kb, b), (kc, c) in zip(
            jax.tree_util.tree_flatten_with_path(wide_params)[0],
            jax.tree_util.tree_flatten_with_path(loaded)[0],
            jax.tree_util.tree_flatten_with_path(params)[0]):
        assert b.shape == a.shape
        if b.ndim == c.ndim:
            crop = tuple(slice(0, min(o, n))
                         for o, n in zip(c.shape, b.shape))
            if np.allclose(np.asarray(b)[crop], np.asarray(c)[crop]):
                copied_any = True
    assert copied_any


def test_dryrun_multichip_8():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_arena_fixed_position_injection(setup):
    """Batched arena started from an injected snapshot (the reference's
    --state / Arena.py:60-65): every lane begins at the given mid-game
    board instead of spec.init."""
    spec, net, params = setup
    # build a distinctive mid-game position
    s = np.asarray(spec.init(jax.random.PRNGKey(5)))
    for a in [int(np.flatnonzero(np.asarray(spec.valids(jnp.asarray(s))))[0])
              for _ in range(1)]:
        s = np.asarray(spec.step_canonical(
            jnp.asarray(s), jnp.int32(a), jax.random.PRNGKey(0),
            jnp.int32(0))[0])
    cfg = MCTSConfig(num_sims=4)
    res = play_matches(spec, net, params, params, jax.random.PRNGKey(0),
                       cfg=cfg, num_games=4, init_state=jnp.asarray(s))
    total = (int(res.one_wins) + int(res.two_wins) + int(res.draws)
             + int(res.unfinished))
    assert total == 4
