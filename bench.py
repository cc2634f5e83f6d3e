#!/usr/bin/env python
"""Benchmark: self-play MCTS throughput on the available accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference achieves ~3000 MCTS rollouts/s on one CPU core with
NN inference >70% of runtime (BASELINE.md; /root/reference/README_features.md:2-3).
Our unit is identical: one MCTS simulation = one tree descent + one NN
evaluation + backup.
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--game", default="santorini",
                    help="any registry game (santorini benches the "
                    "flagship no-gods variant)")
    ap.add_argument("--variant", default=None,
                    help='game variant JSON (default: flagship variant)')
    ap.add_argument("--quick", action="store_true",
                    help="small shapes for CI smoke")
    ap.add_argument("--batch", type=int, default=0,
                    help="parallel games (0 = auto)")
    ap.add_argument("--sims", type=int, default=100)
    ap.add_argument("--moves", type=int, default=16)
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--max-depth", type=int, default=0,
                    help="tree descent depth cap (0 = unbounded/exact); "
                    "capped revisits back up the node's stored Q")
    ap.add_argument("--tree-dtype", default="bfloat16",
                    help="tree prior/q storage dtype (bfloat16 halves the "
                    "dense per-sim passes; float32 matches the parity-test "
                    "configuration bit-for-bit)")
    ap.add_argument("--cpu", action="store_true", help="force CPU platform")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from alphazero_tpu.config import MCTSConfig, NetConfig, SelfPlayConfig
    from alphazero_tpu.games import make_game
    from alphazero_tpu.models import init_params, make_net
    from alphazero_tpu.selfplay.actor import run_selfplay

    platform = jax.devices()[0].platform
    if args.quick:
        B, sims, moves, ch, depth = 32, 16, 4, 32, 2
    else:
        B = args.batch or (4096 if platform != "cpu" else 64)
        sims, moves, ch, depth = args.sims, args.moves, args.channels, args.depth

    import json as _json
    if args.variant is not None:
        variant = _json.loads(args.variant)
    elif args.game == "santorini":
        variant = dict(nb_gods=1, init_method=1)
    else:
        variant = {}
    spec = make_game(args.game, **variant)
    net = make_net(spec, NetConfig(version=1, channels=ch, depth=depth))
    params = init_params(net, spec, jax.random.PRNGKey(0))
    mc = MCTSConfig(num_sims=sims, ratio_full=4, prob_full=0.25,
                    forced_playouts=True, max_depth=args.max_depth,
                    q_dtype=args.tree_dtype, prior_dtype=args.tree_dtype)
    sp = SelfPlayConfig(batch_size=B)

    def run(key):
        batch, stats = run_selfplay(spec, net, params, key, mc=mc, sp=sp,
                                    num_moves=moves, batch_size=B)
        jax.block_until_ready(batch.state)
        return stats

    # warmup (compile)
    run(jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    reps = 1 if args.quick else 3
    sims_total = 0
    moves_total = 0
    for r in range(reps):
        stats = run(jax.random.PRNGKey(r + 1))
        sims_total += int(stats.sims)
        moves_total += int(stats.moves)
    dt = time.perf_counter() - t0

    sims_per_s = sims_total / dt
    result = {
        "metric": "selfplay_mcts_sims_per_s",
        "value": round(sims_per_s, 1),
        "unit": "sims/s",
        # reference: ~3000 rollouts/s on one i5 core (README_features.md:2)
        "vs_baseline": round(sims_per_s / 3000.0, 2),
        "extra": {
            "game": spec.name,
            "platform": platform,
            "batch": B,
            "num_sims": sims,
            "env_steps_per_s": round(moves_total / dt, 1),
            "net": f"{type(net).__name__}_{ch}x{depth}",
            "wall_s": round(dt, 2),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
