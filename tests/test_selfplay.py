"""Self-play actor invariants: example validity, return backfill, PCR."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alphazero_tpu.config import MCTSConfig, NetConfig, SelfPlayConfig
from alphazero_tpu.games import make_game
from alphazero_tpu.models import init_params, make_net
from alphazero_tpu.selfplay.actor import run_selfplay
from alphazero_tpu.selfplay.replay import ReplayBuffer


@pytest.fixture(scope="module")
def setup():
    spec = make_game("santorini", nb_gods=1, init_method=1)
    net = make_net(spec, NetConfig(version=1, channels=16, depth=1))
    params = init_params(net, spec, jax.random.PRNGKey(0))
    return spec, net, params


@pytest.fixture(scope="module")
def rollout(setup):
    spec, net, params = setup
    mc = MCTSConfig(num_sims=16, ratio_full=4, prob_full=0.5,
                    forced_playouts=True)
    sp = SelfPlayConfig(batch_size=8)
    # 48 move slots keeps several completed episodes at a ~halved compile
    #+ run cost vs the old 96 (fast-lane budget, VERDICT r2 weak #8)
    batch, stats = run_selfplay(spec, net, params, jax.random.PRNGKey(1),
                                mc=mc, sp=sp, num_moves=48, batch_size=8)
    return spec, jax.device_get(batch), stats


def test_shapes_and_counts(rollout):
    spec, batch, stats = rollout
    T, B = batch.weight.shape
    assert batch.state.shape == (T, B, *spec.state_shape)
    assert batch.pi.shape == (T, B, spec.num_actions)
    assert int(stats.episodes_done) > 0
    assert int(stats.examples) == int((batch.weight > 0).sum())
    assert int(stats.examples) > 0


def test_policy_targets_valid(rollout):
    spec, batch, _ = rollout
    w = batch.weight > 0
    pi = np.asarray(batch.pi)[w]
    valids = np.asarray(batch.valids)[w]
    np.testing.assert_allclose(pi.sum(-1), 1.0, atol=1e-5)
    assert (pi[~valids] == 0).all()


def test_returns_are_win_loss_pairs(rollout):
    """No-gods Santorini has no draws: every completed episode's example z
    must be a (+1, -1) permutation, and q must be (q0, -q0)."""
    spec, batch, _ = rollout
    w = batch.weight > 0
    z = np.asarray(batch.z)[w]
    assert z.shape[0] > 0
    np.testing.assert_allclose(np.sort(np.abs(z), axis=-1),
                               np.ones_like(z), atol=1e-6)
    np.testing.assert_allclose(z.sum(-1), 0.0, atol=1e-6)
    q = np.asarray(batch.q)[w]
    np.testing.assert_allclose(q[:, 0], -q[:, 1], atol=1e-6)
    assert (np.abs(q) <= 1.0 + 1e-5).all()


def test_unfinished_tail_has_zero_weight(setup):
    """With a tiny move budget no episode completes -> no usable examples."""
    spec, net, params = setup
    mc = MCTSConfig(num_sims=8, ratio_full=4, prob_full=1.0)
    sp = SelfPlayConfig(batch_size=4)
    batch, stats = run_selfplay(spec, net, params, jax.random.PRNGKey(2),
                                mc=mc, sp=sp, num_moves=3, batch_size=4)
    assert int(stats.episodes_done) == 0
    assert float(np.asarray(batch.weight).sum()) == 0.0


def test_replay_roundtrip(rollout, tmp_path):
    spec, batch, stats = rollout
    buf = ReplayBuffer(1000, spec.state_shape, spec.num_actions,
                       spec.num_players, pi_budget=16)
    n = buf.add_batch(batch)
    assert n == int(stats.examples)
    s = buf.sample(np.random.default_rng(0), 32)
    assert s["state"].shape == (32, *spec.state_shape)
    assert s["pi_vals"].dtype == np.float16
    d = buf.sample_dense(np.random.default_rng(0), 32)
    assert d["pi"].shape == (32, spec.num_actions)
    np.testing.assert_allclose(d["pi"].sum(-1), 1.0, atol=1e-3)

    p = str(tmp_path / "replay.npz")
    buf.save(p)
    buf2 = ReplayBuffer(1000, spec.state_shape, spec.num_actions,
                        spec.num_players, pi_budget=16)
    buf2.load(p)
    assert buf2.size == buf.size
    np.testing.assert_array_equal(buf2.state[:buf.size],
                                  buf.state[:buf.size])
    np.testing.assert_array_equal(buf2.pi_vals[:buf.size],
                                  buf.pi_vals[:buf.size])


def test_replay_encoded_matches_dense(rollout):
    """add_encoded(device-encoded batch) stores the same rows as
    add_batch(dense batch): same states, same decoded policies."""
    from alphazero_tpu.selfplay.codec import encode_examples
    spec, batch, stats = rollout
    T, B = batch.weight.shape
    k_pi = 16
    dense = ReplayBuffer(1000, spec.state_shape, spec.num_actions,
                         spec.num_players, pi_budget=k_pi)
    dense.add_batch(batch)
    enc_buf = ReplayBuffer(1000, spec.state_shape, spec.num_actions,
                           spec.num_players, pi_budget=k_pi)
    enc = jax.device_get(encode_examples(
        jax.tree.map(jnp.asarray, batch), num_rows=T * B, k_pi=k_pi))
    n = enc_buf.add_encoded(enc)
    assert n == dense.size == int(stats.examples)
    # same multiset of rows (encode orders by flat index too)
    np.testing.assert_array_equal(enc_buf.state[:n], dense.state[:n])
    ids = np.arange(n)
    np.testing.assert_allclose(enc_buf.rows(ids)["pi"],
                               dense.rows(ids)["pi"], atol=2e-3)
    np.testing.assert_array_equal(enc_buf.rows(ids)["valids"],
                                  dense.rows(ids)["valids"])
    np.testing.assert_allclose(enc_buf.rows(ids)["z"],
                               dense.rows(ids)["z"], atol=1e-3)


def test_chunked_encoded_matches_dense(setup):
    """run_selfplay_chunked with k_pi (device-encoded chunks) inserts exactly
    the rows its dense form (k_pi=None) would: same states/valids, same
    decoded policies/returns.  Covers the production splendor path
    (coach.self_play chunked branch)."""
    from alphazero_tpu.selfplay.actor import run_selfplay_chunked
    spec, net, params = setup
    mc = MCTSConfig(num_sims=12, ratio_full=4, prob_full=0.5)
    sp = SelfPlayConfig(batch_size=8)
    kw = dict(mc=mc, sp=sp, num_moves=40, chunk_moves=16, batch_size=8)
    key = jax.random.PRNGKey(5)
    dense_batch, dense_stats = run_selfplay_chunked(
        spec, net, params, key, **kw)
    encs, enc_stats = run_selfplay_chunked(
        spec, net, params, key, k_pi=12, **kw)
    assert int(enc_stats.episodes_done) == int(dense_stats.episodes_done) > 0
    assert int(enc_stats.examples) == int(dense_stats.examples) > 0

    dense = ReplayBuffer(4000, spec.state_shape, spec.num_actions,
                         spec.num_players, pi_budget=12)
    dense.add_batch(dense_batch)
    buf = ReplayBuffer(4000, spec.state_shape, spec.num_actions,
                       spec.num_players, pi_budget=12)
    n = sum(buf.add_encoded(e) for e in encs)
    assert n == dense.size == int(enc_stats.examples)
    ids = np.arange(n)
    np.testing.assert_array_equal(buf.state[:n], dense.state[:n])
    np.testing.assert_array_equal(buf.rows(ids)["valids"],
                                  dense.rows(ids)["valids"])
    np.testing.assert_allclose(buf.rows(ids)["pi"], dense.rows(ids)["pi"],
                               atol=2e-3)
    np.testing.assert_allclose(buf.rows(ids)["z"], dense.rows(ids)["z"],
                               atol=1e-3)


def test_codec_roundtrips():
    from alphazero_tpu.selfplay import codec
    rng = np.random.default_rng(3)
    mask = rng.random((5, 43)) < 0.4
    packed = np.asarray(codec.pack_bool(jnp.asarray(mask)))
    np.testing.assert_array_equal(packed, np.packbits(mask, axis=-1))
    np.testing.assert_array_equal(
        np.asarray(codec.unpack_bool(jnp.asarray(packed), 43)), mask)
    np.testing.assert_array_equal(codec.unpack_bool_np(packed, 43), mask)

    # sparse pi roundtrip: <=k nonzeros survive exactly (mod f16 + renorm)
    pi = np.zeros((4, 37), np.float32)
    for r in range(4):
        nz = rng.choice(37, size=7, replace=False)
        w = rng.random(7).astype(np.float32)
        pi[r, nz] = w / w.sum()
    vals, idx = codec.sparsify_pi(jnp.asarray(pi), 8)
    back = np.asarray(codec.densify_pi(vals, idx, 37))
    np.testing.assert_allclose(back, pi, atol=2e-3)
    back_np = codec.densify_pi_np(np.asarray(vals), np.asarray(idx), 37)
    np.testing.assert_allclose(back_np, pi, atol=2e-3)


def test_dyn_selfplay_bitexact_and_quota(setup):
    """run_selfplay_dyn (data-dependent while_loop move loop + on-device
    quota exit, the scan-fault escape path) is BIT-IDENTICAL to
    run_selfplay when the quota never binds — with and without dyn_sims —
    and stops early when it does."""
    import dataclasses

    from alphazero_tpu.selfplay.actor import run_selfplay_dyn

    spec, net, params = setup
    mc = MCTSConfig(num_sims=16, ratio_full=4, prob_full=0.5,
                    forced_playouts=True)
    sp = SelfPlayConfig(batch_size=8)
    kw = dict(mc=mc, sp=sp, num_moves=48, batch_size=8)
    ref, ref_stats = run_selfplay(spec, net, params, jax.random.PRNGKey(1),
                                  **kw)
    for mc_i in (mc, dataclasses.replace(mc, dyn_sims=True)):
        got, got_stats = run_selfplay_dyn(
            spec, net, params, jax.random.PRNGKey(1), 10_000,
            **{**kw, "mc": mc_i})
        assert int(got_stats.episodes_done) == int(ref_stats.episodes_done)
        for f in ("state", "pi", "z", "q", "valids", "weight"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)),
                err_msg=f"dyn(dyn_sims={mc_i.dyn_sims}) field {f} differs")

    # quota early-exit: one finished episode is enough to stop the loop
    got, st = run_selfplay_dyn(spec, net, params, jax.random.PRNGKey(1), 1,
                               **kw)
    assert int(st.episodes_done) >= 1
    assert int(st.moves) < 48 * 8  # stopped before the buffer filled


def test_dyn_staged_bitexact(setup):
    """dyn_stages>1 (the dyn while_loop split into k width stages over
    growing arenas — the round-5 staging lever) is BIT-IDENTICAL to the
    single full-width dyn loop AND to the scan path."""
    import dataclasses

    from alphazero_tpu.selfplay.actor import run_selfplay_dyn

    spec, net, params = setup
    mc = MCTSConfig(num_sims=16, ratio_full=4, prob_full=0.5,
                    forced_playouts=True, dyn_sims=True)
    sp = SelfPlayConfig(batch_size=8)
    kw = dict(sp=sp, num_moves=48, batch_size=8)
    ref, ref_stats = run_selfplay_dyn(spec, net, params,
                                      jax.random.PRNGKey(1), 10_000,
                                      mc=mc, **kw)
    for k in (3, 4):
        got, got_stats = run_selfplay_dyn(
            spec, net, params, jax.random.PRNGKey(1), 10_000,
            mc=dataclasses.replace(mc, dyn_stages=k), **kw)
        assert int(got_stats.episodes_done) == int(ref_stats.episodes_done)
        for f in ("state", "pi", "z", "q", "valids", "weight"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)),
                err_msg=f"dyn_stages={k} field {f} differs")


def test_merged_pcr_examples_valid(setup):
    """pcr_split=False: ONE merged per-lane-budget search (the small-program
    mode for engines near the TPU size fault) must yield the same example
    contract as the split path: weight>0 only on full lanes, normalized
    pruned policies, per-player returns."""
    spec, net, params = setup
    mc = MCTSConfig(num_sims=16, ratio_full=4, prob_full=0.5,
                    forced_playouts=True)
    sp = SelfPlayConfig(batch_size=8, pcr_split=False)
    batch, stats = run_selfplay(spec, net, params, jax.random.PRNGKey(3),
                                mc=mc, sp=sp, num_moves=48, batch_size=8)
    batch = jax.device_get(batch)
    assert int(stats.episodes_done) > 0
    assert int(stats.examples) > 0
    w = batch.weight > 0
    # examples only on full-search moves: their pruned visit policies are
    # normalized and supported on valid actions
    pi = batch.pi[w]
    np.testing.assert_allclose(pi.sum(-1), 1.0, atol=1e-5)
    assert (pi[~batch.valids[w]] == 0).all()
    # merged budgets: full lanes carry ~num_sims root visits, so no example
    # policy can be built from fewer than num_sims//ratio_full visits
    z = batch.z[w]
    np.testing.assert_allclose(z.sum(-1), 0.0, atol=1e-5)
    assert np.abs(z).max() <= 1.0 + 1e-6


def _fill(buf, lo, hi):
    for i in range(lo, hi):
        st = np.full((1, 2), i % 127, np.int8)
        buf._insert(st, np.zeros((1, 3), np.float16),
                    np.zeros((1, 3), np.int32),
                    np.full((1, 2), i, np.float16),
                    np.zeros((1, 2), np.float16),
                    np.zeros((1, 1), np.uint8))


def test_wrapped_ring_save_load_age_order(tmp_path):
    """After the ring wraps, save() persists rows oldest-first so a resumed
    buffer's head/newest-row indexing stays correct (ADVICE r3), and a
    smaller buffer keeps the NEWEST rows on load."""
    buf = ReplayBuffer(10, (2,), 3, 2, pi_budget=3)
    _fill(buf, 0, 17)           # wrapped: holds rows 7..16, head at 7
    assert buf.size == 10 and buf.head == 7
    p = str(tmp_path / "wrapped.npz")
    buf.save(p)

    buf2 = ReplayBuffer(10, (2,), 3, 2, pi_budget=3)
    buf2.load(p)
    assert buf2.size == 10
    # age order restored: slot 0 = oldest surviving row (7), slot 9 = newest
    np.testing.assert_array_equal(buf2.z[:10, 0],
                                  np.arange(7, 17, dtype=np.float16))
    # continuing to insert overwrites the OLDEST row first
    _fill(buf2, 17, 18)
    assert 7.0 not in buf2.z[:10, 0]
    assert 17.0 in buf2.z[:10, 0]

    # truncating load into a smaller buffer keeps the newest rows
    small = ReplayBuffer(4, (2,), 3, 2, pi_budget=3)
    small.load(p)
    assert small.size == 4
    np.testing.assert_array_equal(small.z[:4, 0],
                                  np.arange(13, 17, dtype=np.float16))


def test_ring_overwrite():
    buf = ReplayBuffer(10, (2,), 3, 2, pi_budget=3)
    for i in range(4):
        st = np.full((4, 2), i, np.int8)
        buf._insert(st, np.zeros((4, 3), np.float16),
                    np.zeros((4, 3), np.int32),
                    np.zeros((4, 2), np.float16),
                    np.zeros((4, 2), np.float16),
                    np.zeros((4, 1), np.uint8))
    assert buf.size == 10
    assert buf.total_added == 16
    # oldest entries overwritten
    vals = sorted(set(buf.state[:, 0].tolist()))
    assert 0 not in vals or len(vals) <= 3


def test_chunked_quota_early_exit(setup):
    """stop_after_episodes halts the chunk loop once the quota is met:
    fewer chunks scanned than the full pass, episodes >= quota, and the
    recorded examples still round-trip the buffer (weights consistent)."""
    from alphazero_tpu.selfplay.actor import run_selfplay_chunked
    spec, net, params = setup
    mc = MCTSConfig(num_sims=12, ratio_full=4, prob_full=0.5)
    sp = SelfPlayConfig(batch_size=8)
    key = jax.random.PRNGKey(6)
    full_batch, full_stats = run_selfplay_chunked(
        spec, net, params, key, mc=mc, sp=sp, num_moves=64, chunk_moves=8,
        batch_size=8)
    assert int(full_stats.episodes_done) >= 2
    stop_batch, stop_stats = run_selfplay_chunked(
        spec, net, params, key, mc=mc, sp=sp, num_moves=64, chunk_moves=8,
        batch_size=8, stop_after_episodes=1)
    assert int(stop_stats.episodes_done) >= 1
    assert int(stop_stats.moves) < int(full_stats.moves)
    # prefix determinism: the early-exit pass records the same moves as the
    # full pass over the chunks it did run
    T = stop_batch.state.shape[0]
    np.testing.assert_array_equal(stop_batch.state, full_batch.state[:T])
    # truncation only REMOVES finished-game examples, never invents them
    assert int(stop_stats.examples) <= int(full_stats.examples)
    assert (stop_batch.weight > 0).sum() == int(stop_stats.examples)
