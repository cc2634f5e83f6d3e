"""Bisect the minivilles TPU worker fault (round-5 addendum 3): run each
engine kernel ALONE on the chip at the failing batch to find which one
kills the worker.  Run under `timeout` from a driver; stage selected by
argv so each attempt is its own process/client.

usage: probe_minivilles_fault.py STAGE [B]
  stages: init valids observe terminal step mcts16 selfplay2
"""
import sys
import time

sys.path.insert(0, "/root/repo")

stage = sys.argv[1]
B = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

import jax
import jax.numpy as jnp

from alphazero_tpu.games import make_game

spec = make_game("minivilles")
key = jax.random.PRNGKey(0)
states = jax.vmap(spec.init)(jax.random.split(key, B))
jax.block_until_ready(states)
print("init ok", states.shape, flush=True)
if stage == "init":
    sys.exit(0)

if stage in ("valids", "observe", "terminal"):
    fn = {"valids": spec.valids, "observe": spec.observe,
          "terminal": spec.terminal}[stage]
    out = jax.jit(jax.vmap(fn))(states)
    jax.block_until_ready(out)
    print(stage, "ok", out.shape, flush=True)
    sys.exit(0)

if stage == "step":
    v = jax.jit(jax.vmap(spec.valids))(states)
    a = jnp.argmax(v, axis=-1).astype(jnp.int32)

    @jax.jit
    def step_n(s, k):
        def body(i, carry):
            s, k = carry
            k = jax.random.fold_in(k, i)
            va = jax.vmap(spec.valids)(s)
            act = jnp.argmax(va, -1).astype(jnp.int32)
            ns, sw = jax.vmap(spec.step_canonical)(
                s, act, jax.random.split(k, B),
                jnp.zeros((B,), jnp.int32))
            return ns, k
        return jax.lax.fori_loop(0, 16, body, (s, k))[0]

    out = step_n(states, key)
    jax.block_until_ready(out)
    print("step x16 ok", flush=True)
    sys.exit(0)

if stage == "mcts16":
    from alphazero_tpu.config import MCTSConfig, NetConfig
    from alphazero_tpu.models import init_params, make_eval_fn, make_net
    from alphazero_tpu.search.mcts import mcts_search

    net = make_net(spec, NetConfig(version=1, channels=64, depth=4))
    params = init_params(net, spec, jax.random.PRNGKey(0))

    def eval_fn(p, obs, valids):
        log_pi, v = net.apply(p, obs, valids)
        return jnp.exp(log_pi), v

    mc = MCTSConfig(num_sims=16, universes=3)
    out, _ = jax.jit(lambda s, k: mcts_search(
        spec, eval_fn, params, s, k, jnp.full((B,), 16, jnp.int32),
        jnp.zeros((B,), bool), jnp.full((B,), False), cfg=mc,
        num_sims_max=16, use_noise=False))(states, key)
    jax.block_until_ready(out.counts)
    print("mcts16 ok", flush=True)
    sys.exit(0)

if stage == "selfplay2":
    from alphazero_tpu.config import MCTSConfig, NetConfig, SelfPlayConfig
    from alphazero_tpu.models import init_params, make_net
    from alphazero_tpu.selfplay.actor import run_selfplay_dyn

    net = make_net(spec, NetConfig(version=1, channels=64, depth=4))
    params = init_params(net, spec, jax.random.PRNGKey(0))
    mc = MCTSConfig(num_sims=16, universes=3, dyn_sims=True)
    sp = SelfPlayConfig(batch_size=B, pcr_split=False, dyn=True)
    t0 = time.time()
    batch, stats = run_selfplay_dyn(spec, net, params, jax.random.PRNGKey(1),
                                    B, mc=mc, sp=sp, num_moves=2,
                                    batch_size=B)
    jax.block_until_ready(batch.state)
    print(f"selfplay 2 moves ok in {time.time()-t0:.1f}s", flush=True)
    sys.exit(0)

print("unknown stage", stage)
sys.exit(2)
