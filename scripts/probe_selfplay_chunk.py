import sys
sys.path.insert(0, "/root/repo")
import jax
from alphazero_tpu.config import MCTSConfig, NetConfig, SelfPlayConfig
from alphazero_tpu.games import make_game
from alphazero_tpu.models import init_params, make_net
from alphazero_tpu.selfplay.actor import run_selfplay

moves, batch, sims, univ, forced, ch, depth, stages = (
    int(x) for x in sys.argv[1:9])
spec = make_game("splendor")
net = make_net(spec, NetConfig(version=1, channels=ch, depth=depth))
params = init_params(net, spec, jax.random.PRNGKey(0))
mc = MCTSConfig(num_sims=sims, universes=univ, forced_playouts=bool(forced),
                cpuct=2.5, fpu=0.1, arena_stages=stages)
batch_, stats = run_selfplay(
    spec, net, params, jax.random.PRNGKey(1), mc=mc,
    sp=SelfPlayConfig(batch_size=batch), num_moves=moves, batch_size=batch)
jax.block_until_ready(batch_.state)
print("PROBE_OK", int(stats.episodes_done))
