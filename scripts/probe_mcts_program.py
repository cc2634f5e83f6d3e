import sys
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from alphazero_tpu.config import MCTSConfig, NetConfig
from alphazero_tpu.games import make_game
from alphazero_tpu.models import init_params, make_net
from alphazero_tpu.search.mcts import mcts_search

batch, sims, univ, forced, ch, depth = (int(x) for x in sys.argv[1:7])
spec = make_game("splendor")
net = make_net(spec, NetConfig(version=1, channels=ch, depth=depth))
params = init_params(net, spec, jax.random.PRNGKey(0))
mc = MCTSConfig(num_sims=sims, universes=univ, forced_playouts=bool(forced),
                cpuct=2.5, fpu=0.1)


def eval_fn(p, obs, valids):
    log_pi, v = net.apply(p, obs, valids)
    return jnp.exp(log_pi), v


states = jax.vmap(spec.init)(jax.random.split(jax.random.PRNGKey(1), batch))


@jax.jit
def go(params, states):
    out, _ = mcts_search(
        spec, eval_fn, params, states, jax.random.PRNGKey(2),
        jnp.full((batch,), sims, jnp.int32),
        jnp.ones((batch,), bool), jnp.full((batch,), bool(forced), bool),
        cfg=mc, num_sims_max=sims)
    return out.counts


pi = go(params, states)
jax.block_until_ready(pi)
print("PROBE_OK", pi.shape)
