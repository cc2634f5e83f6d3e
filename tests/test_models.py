"""Versioned network factory: every (version, game family) builds, runs,
masks invalid actions, and takes gradients (the reference's numbered
per-game architectures behind one factory, SURVEY.md §2.4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from alphazero_tpu.config import NetConfig
from alphazero_tpu.games import make_game
from alphazero_tpu.models import init_params, make_net, transfer_params

CASES = [
    ("santorini", dict(nb_gods=1, init_method=1), 0),   # MLP
    ("santorini", dict(nb_gods=1, init_method=1), 1),   # conv
    ("santorini", dict(nb_gods=1, init_method=1), 2),   # FiLM conv
    ("splendor", {}, 1),                                # mixer
    ("splendor", {}, 2),                                # entity transformer
]


@pytest.mark.parametrize("game,variant,version", CASES)
def test_forward_and_grad(game, variant, version):
    spec = make_game(game, **variant)
    net = make_net(spec, NetConfig(version=version, channels=32, depth=2))
    params = init_params(net, spec, jax.random.PRNGKey(0))
    B = 4
    obs = jax.vmap(spec.observe)(
        jax.vmap(spec.init)(jax.random.split(jax.random.PRNGKey(1), B)))
    valids = jnp.zeros((B, spec.num_actions), bool).at[:, :7].set(True)

    log_pi, v = net.apply(params, obs, valids)
    assert log_pi.shape == (B, spec.num_actions)
    assert v.shape == (B, spec.num_players)
    pi = np.asarray(jnp.exp(log_pi))
    np.testing.assert_allclose(pi.sum(-1), 1.0, atol=1e-3)
    assert (pi[:, 7:] < 1e-6).all(), "mask leaked probability"
    assert (np.abs(np.asarray(v)) <= 1.0 + 1e-6).all()

    def loss(p):
        lp, vv = net.apply(p, obs, valids)
        return -jnp.mean(lp[:, 0]) + jnp.mean(vv ** 2)

    g = jax.grad(loss)(params)
    gn = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_knowledge_transfer_across_versions():
    """Shape-cropped warm start across channel widths (reference
    GenericNNetWrapper.load_network, :222-277)."""
    spec = make_game("santorini", nb_gods=1, init_method=1)
    small = make_net(spec, NetConfig(version=1, channels=16, depth=2))
    big = make_net(spec, NetConfig(version=1, channels=32, depth=2))
    p_small = init_params(small, spec, jax.random.PRNGKey(0))
    p_big = init_params(big, spec, jax.random.PRNGKey(1))
    merged, copied = transfer_params(p_small, p_big)
    assert copied > 0
    for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(p_big)):
        assert a.shape == b.shape
