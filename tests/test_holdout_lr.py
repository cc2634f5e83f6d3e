"""Held-out lane split (true validation reserve) and peak-LR annealing.

The reference evaluates on a held-out examples file produced by episode-level
splitting (/root/reference/GenericNNetWrapper.py:159-177, Coach.py:294-346
``[::8]`` test split); here whole self-play lanes are routed to a validation
ring before training sampling ever sees them.  The LR anneal reproduces the
reference's staged peak-LR recipe (/root/reference/README.md:157-163) as a
traced scale on the per-iteration OneCycle.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alphazero_tpu.config import NetConfig, TrainConfig
from alphazero_tpu.games import make_game
from alphazero_tpu.models import init_params, make_net
from alphazero_tpu.selfplay.actor import SelfPlayBatch
from alphazero_tpu.selfplay.codec import encode_examples
from alphazero_tpu.selfplay.replay import ReplayBuffer
from alphazero_tpu.train.learner import (init_train_state, make_lr_schedule,
                                         train_step)


def _fake_selfplay_batch(spec, T, B, seed=0):
    rng = np.random.default_rng(seed)
    states = np.asarray(jax.vmap(spec.init)(
        jax.random.split(jax.random.PRNGKey(seed), T * B))).reshape(
        (T, B) + spec.state_shape)
    valids = np.asarray(jax.vmap(jax.vmap(spec.valids))(jnp.asarray(states)))
    pi = rng.random((T, B, spec.num_actions)).astype(np.float32) * valids
    pi /= np.maximum(pi.sum(-1, keepdims=True), 1e-9)
    z = rng.choice([-1.0, 1.0], (T, B, 1)).astype(np.float32)
    z = np.concatenate([z, -z], axis=-1)
    return SelfPlayBatch(
        state=jnp.asarray(states), pi=jnp.asarray(pi), z=jnp.asarray(z),
        q=jnp.asarray(z * 0.5), valids=jnp.asarray(valids),
        weight=jnp.ones((T, B), jnp.float32))


def test_holdout_lane_routing():
    """Rows from lanes with lane % mod == 0 land in the val ring only; the
    training ring never contains a holdout lane's rows."""
    spec = make_game("santorini", nb_gods=1, init_method=1)
    T, B, MOD = 3, 8, 4
    batch = _fake_selfplay_batch(spec, T, B)
    enc = jax.device_get(encode_examples(batch, num_rows=T * B, k_pi=16))
    # encoded lanes are flat_index % B
    np.testing.assert_array_equal(np.asarray(enc.lane),
                                  np.tile(np.arange(B), T))
    buf = ReplayBuffer(1024, spec.state_shape, spec.num_actions,
                       spec.num_players, pi_budget=16, holdout_lane_mod=MOD)
    n_train = buf.add_encoded(enc)
    n_hold = T * (B // MOD)  # lanes 0 and 4
    assert buf.val.size == n_hold
    assert n_train == T * B - n_hold
    assert buf.size == n_train
    # holdout rows are exactly the lane-0/4 states
    hold_states = np.asarray(enc.state)[np.asarray(enc.lane) % MOD == 0]
    np.testing.assert_array_equal(buf.val.state[:buf.val.size], hold_states)
    # training sampling can never return a holdout row
    rng = np.random.default_rng(0)
    s = buf.sample(rng, 64)
    train_states = buf.state[:buf.size]
    for row in s["state"]:
        assert any((row == t).all() for t in train_states)


def test_holdout_persistence_roundtrip(tmp_path):
    spec = make_game("santorini", nb_gods=1, init_method=1)
    batch = _fake_selfplay_batch(spec, 2, 8, seed=1)
    enc = jax.device_get(encode_examples(batch, num_rows=16, k_pi=16))
    buf = ReplayBuffer(256, spec.state_shape, spec.num_actions,
                       spec.num_players, pi_budget=16, holdout_lane_mod=4)
    buf.add_encoded(enc)
    p = str(tmp_path / "replay.npz")
    buf.save(p)
    buf2 = ReplayBuffer(256, spec.state_shape, spec.num_actions,
                        spec.num_players, pi_budget=16, holdout_lane_mod=4)
    buf2.load(p)
    assert buf2.val.size == buf.val.size
    np.testing.assert_array_equal(buf2.val.state[:buf2.val.size],
                                  buf.val.state[:buf.val.size])
    np.testing.assert_array_equal(buf2.state[:buf2.size], buf.state[:buf.size])


def test_lr_scale_scales_schedule():
    cfg = TrainConfig(learn_rate=2e-3)
    s1 = make_lr_schedule(cfg, 100, 1.0)
    s2 = make_lr_schedule(cfg, 100, 0.1)
    for step in (0, 30, 99):
        np.testing.assert_allclose(float(s2(step)), 0.1 * float(s1(step)),
                                   rtol=1e-6)


def test_peak_lr_scale_formula():
    from alphazero_tpu.train.learner import peak_lr_scale
    cfg = TrainConfig(learn_rate=2e-3, lr_anneal_iters=4, lr_final=2e-4)
    np.testing.assert_allclose(peak_lr_scale(cfg, 1), 1.0)
    np.testing.assert_allclose(peak_lr_scale(cfg, 2), 0.1 ** 0.25, rtol=1e-9)
    np.testing.assert_allclose(peak_lr_scale(cfg, 5), 0.1, rtol=1e-9)
    np.testing.assert_allclose(peak_lr_scale(cfg, 50), 0.1, rtol=1e-9)
    off = TrainConfig(learn_rate=2e-3, lr_anneal_iters=0)
    assert peak_lr_scale(off, 30) == 1.0


@pytest.mark.slow
def test_lr_scale_freezes_at_zero():
    # lr_scale=0 must leave params bitwise unchanged through a train step
    cfg = TrainConfig(learn_rate=2e-3)
    spec = make_game("santorini", nb_gods=1, init_method=1)
    net = make_net(spec, NetConfig(version=1, channels=16, depth=1))
    params = init_params(net, spec, jax.random.PRNGKey(0))
    state = init_train_state(params, cfg, total_steps=4)
    batch = _fake_selfplay_batch(spec, 1, 16)
    dense = {k: jnp.asarray(np.asarray(getattr(batch, kk))[0])
             for k, kk in [("state", "state"), ("pi", "pi"), ("z", "z"),
                           ("q", "q"), ("valids", "valids")]}
    new_state, m = train_step(spec, net, cfg, 4, state, dense,
                              jax.random.PRNGKey(0), augment=False,
                              lr_scale=0.0)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(float(m.loss))


@pytest.mark.slow
def test_coach_anneal_lr_peak_metric(tmp_path):
    """Coach records the annealed peak and it decays across iterations."""
    from alphazero_tpu.config import (Config, GameConfig, MCTSConfig,
                                      SelfPlayConfig)
    from alphazero_tpu.train.coach import Coach
    cfg = Config(
        game=GameConfig(name="santorini",
                        variant=dict(nb_gods=1, init_method=1)),
        mcts=MCTSConfig(num_sims=8),
        selfplay=SelfPlayConfig(batch_size=8),
        train=TrainConfig(learn_rate=2e-3, lr_anneal_iters=4, lr_final=2e-4,
                          epochs=1, batch_size=32, games_per_iter=2,
                          arena_games=2, replay_capacity=2048, num_iters=2,
                          holdout_lane_mod=4),
        net=NetConfig(version=1, channels=8, depth=1),
        checkpoint_dir=str(tmp_path))
    coach = Coach(cfg)
    m1 = coach.run_iteration()
    m2 = coach.run_iteration()
    p1, p2 = m1["train"]["lr_peak"], m2["train"]["lr_peak"]
    np.testing.assert_allclose(p1, 2e-3, rtol=1e-6)   # iteration 1: no decay
    expect2 = 2e-3 * (0.1) ** (1 / 4)
    np.testing.assert_allclose(p2, expect2, rtol=1e-6)
    # the holdout ring is being fed and used for validation
    assert coach.replay.val.size > 0
    assert m2["train"].get("val_holdout") in (True, False)


def test_history_window_sampling():
    """window=N restricts sampling to the NEWEST N rows, across a ring
    wrap (the reference's numItersHistory drop-oldest example history)."""
    spec = make_game("santorini", nb_gods=1, init_method=1)
    buf = ReplayBuffer(64, spec.state_shape, spec.num_actions,
                       spec.num_players, pi_budget=16)
    # insert 100 rows with a distinguishable marker in state[0,0,0]
    import dataclasses as dc
    for j in range(10):
        batch = _fake_selfplay_batch(spec, 1, 10, seed=j)
        st = np.array(batch.state)
        st.reshape(1, 10, -1)[..., 0] = np.arange(j * 10, (j + 1) * 10) % 120
        buf.add_batch(dc.replace(batch, state=jnp.asarray(st)))
    rng = np.random.default_rng(0)
    got = buf.sample(rng, 256, window=20)
    # newest 20 rows carry markers 80..99
    markers = got["state"].reshape(256, -1)[:, 0].astype(np.int64)
    assert set(markers.tolist()) <= set(range(80, 100))
    # window=None keeps sampling the whole live ring
    got_all = buf.sample(rng, 512)
    all_markers = got_all["state"].reshape(512, -1)[:, 0].astype(np.int64)
    assert len(set(all_markers.tolist())) > 30
