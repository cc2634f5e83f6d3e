"""Probe the DYNAMIC self-play program (run_selfplay_dyn) on the live chip.

The scan-fault hypothesis (docs/tpu_limits.md) is that known-trip-count
loops of big-bodied engines exhaust worker compile resources; the dynamic
path's data-dependent bounds cannot be unrolled, so it should compile fast
and survive ANY num_moves/num_sims.  Run under `timeout` from a driver —
a fault kills this child only.

usage: probe_selfplay_dyn.py MOVES BATCH SIMS UNIV FORCED CH DEPTH \
           [PCR_SPLIT=1] [DYN_SIMS=1] [QUOTA=0] [GAME=splendor] \
           [TREE_DTYPE=float32]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

from alphazero_tpu.config import MCTSConfig, NetConfig, SelfPlayConfig
from alphazero_tpu.games import make_game
from alphazero_tpu.models import init_params, make_net
from alphazero_tpu.selfplay.actor import run_selfplay_dyn

moves, batch, sims, univ, forced, ch, depth = (
    int(x) for x in sys.argv[1:8])
pcr_split = bool(int(sys.argv[8])) if len(sys.argv) > 8 else True
dyn_sims = bool(int(sys.argv[9])) if len(sys.argv) > 9 else True
quota = int(sys.argv[10]) if len(sys.argv) > 10 else 0
game = sys.argv[11] if len(sys.argv) > 11 else "splendor"
tree_dtype = sys.argv[12] if len(sys.argv) > 12 else "float32"

spec = make_game(game)
net = make_net(spec, NetConfig(version=1, channels=ch, depth=depth))
params = init_params(net, spec, jax.random.PRNGKey(0))
mc = MCTSConfig(num_sims=sims, universes=univ, forced_playouts=bool(forced),
                cpuct=2.5, fpu=0.1, dyn_sims=dyn_sims,
                q_dtype=tree_dtype, prior_dtype=tree_dtype)
sp = SelfPlayConfig(batch_size=batch, pcr_split=pcr_split, dyn=True)
q = quota or moves * batch

t0 = time.time()
batch_, stats = run_selfplay_dyn(
    spec, net, params, jax.random.PRNGKey(1), q, mc=mc, sp=sp,
    num_moves=moves, batch_size=batch)
jax.block_until_ready(batch_.state)
t_compile = time.time() - t0

t0 = time.time()
batch_, stats = run_selfplay_dyn(
    spec, net, params, jax.random.PRNGKey(2), q, mc=mc, sp=sp,
    num_moves=moves, batch_size=batch)
jax.block_until_ready(batch_.state)
t_run = time.time() - t0
print(f"PROBE_OK eps={int(stats.episodes_done)} sims={int(stats.sims)} "
      f"moves={int(stats.moves)} compile+run1={t_compile:.1f}s "
      f"run2={t_run:.2f}s sims_per_s={int(stats.sims) / t_run:.0f}",
      flush=True)
