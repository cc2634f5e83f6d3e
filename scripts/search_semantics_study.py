#!/usr/bin/env python
"""Search-semantics quantification (VERDICT r1 item 3): arena duels between
depth-capped and exact search at EQUAL simulation budgets, on Santorini
(trained net if a checkpoint is given) and Splendor (chance game).

With the dense engine, a depth cap no longer buys throughput (per-sim cost
is depth-independent), so this measures what the cap COSTS in strength —
the data behind choosing exact search as the default.

Usage: python scripts/search_semantics_study.py [--ckpt DIR] [--games N]
Writes one JSON line per matchup to stdout and STRENGTH artifacts dir.
"""
import argparse
import dataclasses
import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None, help="trained santorini ckpt dir")
    p.add_argument("--games", type=int, default=512)
    p.add_argument("--sims", type=int, default=100)
    p.add_argument("--caps", type=int, nargs="+", default=[8, 24])
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from alphazero_tpu.config import MCTSConfig, NetConfig
    from alphazero_tpu.games import make_game
    from alphazero_tpu.models import init_params, make_net
    from alphazero_tpu.train.arena import play_matches
    from alphazero_tpu.train.checkpoint import load_checkpoint, load_config

    results = []

    def duel(name, spec, net, params, base_cfg, cap):
        exact = dataclasses.replace(base_cfg, num_sims=args.sims, max_depth=0)
        capped = dataclasses.replace(base_cfg, num_sims=args.sims,
                                     max_depth=cap)
        res = play_matches(spec, net, params, params, jax.random.PRNGKey(7),
                           cfg=exact, cfg_b=capped, num_games=args.games)
        one, two, dr = int(res.one_wins), int(res.two_wins), int(res.draws)
        dec = max(one + two, 1)
        # Elo difference from winrate (draws as half)
        import math
        wr = (one + 0.5 * dr) / max(one + two + dr, 1)
        wr = min(max(wr, 1e-6), 1 - 1e-6)
        elo = 400 * math.log10(wr / (1 - wr))
        out = dict(matchup=f"{name}: exact vs cap{cap}", sims=args.sims,
                   games=args.games, exact_wins=one, capped_wins=two,
                   draws=dr, unfinished=int(res.unfinished),
                   exact_winrate=round(wr, 4), elo_exact_minus_capped=round(elo, 1))
        print(json.dumps(out), flush=True)
        results.append(out)

    # Santorini (trained net when available)
    spec_s = make_game("santorini", nb_gods=1, init_method=1)
    if args.ckpt:
        cfg = load_config(args.ckpt)
        net_s = make_net(spec_s, cfg.net)
        params_s, _, _, _ = load_checkpoint(
            args.ckpt, init_params(net_s, spec_s, jax.random.PRNGKey(0)))
        base_s = cfg.mcts
    else:
        net_s = make_net(spec_s, NetConfig(version=1, channels=64, depth=3))
        params_s = init_params(net_s, spec_s, jax.random.PRNGKey(0))
        base_s = MCTSConfig()
    for cap in args.caps:
        duel("santorini", spec_s, net_s, params_s, base_s, cap)

    # Splendor (chance game; untrained net isolates pure search semantics)
    spec_p = make_game("splendor", num_players=2)
    net_p = make_net(spec_p, NetConfig(version=1, channels=64, depth=3))
    params_p = init_params(net_p, spec_p, jax.random.PRNGKey(1))
    for cap in args.caps:
        duel("splendor", spec_p, net_p, params_p,
             MCTSConfig(universes=1), cap)

    if args.out:
        with open(args.out, "a") as f:
            for r in results:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
