"""One self-play program-shape probe, run as a disposable subprocess.

A faulting shape kills the TPU worker (docs/tpu_limits.md), so the bisect
driver runs each probe under `timeout` and health-checks the tunnel between
probes.  Also reports steady-state timing (second run of the same compiled
program) so safe shapes double as throughput measurements.

usage: probe_selfplay_chunk.py MOVES BATCH SIMS UNIV FORCED CH DEPTH STAGES \
           [PCR_SPLIT=1] [GAME=splendor]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

from alphazero_tpu.config import MCTSConfig, NetConfig, SelfPlayConfig
from alphazero_tpu.games import make_game
from alphazero_tpu.models import init_params, make_net
from alphazero_tpu.selfplay.actor import run_selfplay

moves, batch, sims, univ, forced, ch, depth, stages = (
    int(x) for x in sys.argv[1:9])
pcr_split = bool(int(sys.argv[9])) if len(sys.argv) > 9 else True
game = sys.argv[10] if len(sys.argv) > 10 else "splendor"
spec = make_game(game)
net = make_net(spec, NetConfig(version=1, channels=ch, depth=depth))
params = init_params(net, spec, jax.random.PRNGKey(0))
mc = MCTSConfig(num_sims=sims, universes=univ, forced_playouts=bool(forced),
                cpuct=2.5, fpu=0.1, arena_stages=stages)
sp = SelfPlayConfig(batch_size=batch, pcr_split=pcr_split)

t0 = time.time()
batch_, stats = run_selfplay(
    spec, net, params, jax.random.PRNGKey(1), mc=mc,
    sp=sp, num_moves=moves, batch_size=batch)
jax.block_until_ready(batch_.state)
t_compile = time.time() - t0

t0 = time.time()
batch_, stats = run_selfplay(
    spec, net, params, jax.random.PRNGKey(2), mc=mc,
    sp=sp, num_moves=moves, batch_size=batch)
jax.block_until_ready(batch_.state)
t_run = time.time() - t0
print(f"PROBE_OK eps={int(stats.episodes_done)} sims={int(stats.sims)} "
      f"compile+run1={t_compile:.1f}s run2={t_run:.2f}s "
      f"sims_per_s={int(stats.sims) / t_run:.0f}", flush=True)
