#!/usr/bin/env python
"""Tree-reuse Elo measurement (VERDICT r1 item 4): asymmetric arena where
only player A carries its search tree across moves, both sides at equal
simulation budgets with the same net."""
import argparse
import dataclasses
import json
import math
import sys

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt")
    p.add_argument("--games", type=int, default=256)
    p.add_argument("--sims", type=int, default=100)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from alphazero_tpu.games import make_game
    from alphazero_tpu.models import init_params, make_net
    from alphazero_tpu.train.arena import play_matches_host
    from alphazero_tpu.train.checkpoint import load_checkpoint, load_config

    cfg = load_config(args.ckpt)
    spec = make_game(cfg.game.name, **cfg.game.variant)
    net = make_net(spec, cfg.net)
    params, _, _, _ = load_checkpoint(
        args.ckpt, init_params(net, spec, jax.random.PRNGKey(0)))
    mc = dataclasses.replace(cfg.mcts, num_sims=args.sims)

    # host move loop: the whole-game reuse scan faults the axon TPU worker
    res = play_matches_host(spec, net, params, params, jax.random.PRNGKey(3),
                            cfg=mc, num_games=args.games, reuse_tree=True,
                            reuse_side="a")
    one, two, dr = int(res.one_wins), int(res.two_wins), int(res.draws)
    wr = (one + 0.5 * dr) / max(one + two + dr, 1)
    wr_c = min(max(wr, 1e-6), 1 - 1e-6)
    out = dict(matchup="reuse(A) vs fresh(B), same net/sims",
               sims=args.sims, games=args.games, reuse_wins=one,
               fresh_wins=two, draws=dr, unfinished=int(res.unfinished),
               reuse_winrate=round(wr, 4),
               elo_reuse_minus_fresh=round(
                   400 * math.log10(wr_c / (1 - wr_c)), 1))
    print(json.dumps(out))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
