"""Bare dyn-sims mcts_search probe: isolate the sims=200 dyn-path fault
(runs/probe_splendor_r4b.log) from the move while_loop.

usage: probe_mcts_dyn.py BATCH SIMS [DYN=1] [STAGES=1] [CH=64] [DEPTH=4]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from alphazero_tpu.config import MCTSConfig, NetConfig
from alphazero_tpu.games import make_game
from alphazero_tpu.models import init_params, make_net
from alphazero_tpu.search.mcts import mcts_search

batch, sims = int(sys.argv[1]), int(sys.argv[2])
dyn = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True
stages = int(sys.argv[4]) if len(sys.argv) > 4 else 1
ch = int(sys.argv[5]) if len(sys.argv) > 5 else 64
depth = int(sys.argv[6]) if len(sys.argv) > 6 else 4

spec = make_game("splendor")
net = make_net(spec, NetConfig(version=1, channels=ch, depth=depth))
params = init_params(net, spec, jax.random.PRNGKey(0))
mc = MCTSConfig(num_sims=sims, universes=3, forced_playouts=True,
                cpuct=0.8, fpu=0.06, dyn_sims=dyn, arena_stages=stages)


def eval_fn(p, obs, valids):
    log_pi, v = net.apply(p, obs, valids)
    return jnp.exp(log_pi), v


states = jax.vmap(spec.init)(jax.random.split(jax.random.PRNGKey(1), batch))


@jax.jit
def go(params, states):
    out, _ = mcts_search(
        spec, eval_fn, params, states, jax.random.PRNGKey(2),
        jnp.full((batch,), sims, jnp.int32),
        jnp.ones((batch,), bool), jnp.ones((batch,), bool),
        cfg=mc, num_sims_max=sims)
    return out.counts


t0 = time.time()
pi = go(params, states)
jax.block_until_ready(pi)
t1 = time.time() - t0
t0 = time.time()
jax.block_until_ready(go(params, states))
t2 = time.time() - t0
print(f"PROBE_OK B={batch} sims={sims} dyn={dyn} stages={stages} "
      f"compile+run1={t1:.1f}s run2={t2:.2f}s "
      f"sims_per_s={batch * sims / t2:.0f}", flush=True)
