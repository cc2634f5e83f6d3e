"""Evaluation CLI — pit checkpoints / random / greedy-like players against
each other with glicko2 ratings (the reference's pit.py:26-195).

Player specs:
  a checkpoint directory path    -> MCTS player with the checkpoint's net and
                                    its embedded hyperparameters (reference
                                    rebuilds MCTS args FROM the checkpoint,
                                    pit.py:42-58)
  "random"                       -> uniform random over valid moves
  "greedy"                       -> generic 1-ply score-lookahead player
  "human"                        -> interactive console player
  "mcts0"                        -> MCTS with an untrained (fresh) net

Any matchup involving "human" (or --verbose) runs move-by-move on the host
with board rendering (reference Arena verbose mode); everything else runs as
one batched jit arena.
"""

from __future__ import annotations

import argparse
import json
import logging
import os


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="alphazero_tpu pit")
    p.add_argument("game", nargs="?", default="santorini")
    p.add_argument("players", nargs=2,
                   help="two player specs (ckpt dir | random | mcts0)")
    p.add_argument("--num-games", "-n", type=int, default=64)
    p.add_argument("--numMCTSSims", "-m", type=int, default=0,
                   help="override sims (0 = use checkpoint value)")
    p.add_argument("--variant", default="{}")
    p.add_argument("--ratings", default=None,
                   help="glicko2 ratings JSON path to update")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--verbose", "-v", action="store_true",
                   help="host-loop play with board rendering per move")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from alphazero_tpu.config import Config, MCTSConfig, NetConfig
    from alphazero_tpu.games import make_game
    from alphazero_tpu.models import init_params, make_net
    from alphazero_tpu.train.arena import play_matches, play_vs_random
    from alphazero_tpu.train.checkpoint import load_checkpoint, load_config
    from alphazero_tpu.utils.ratings import (load_ratings, save_ratings,
                                             update_pair)

    variant = json.loads(args.variant)
    spec = make_game(args.game, **variant)

    def build(spec_str, key):
        """Returns (kind, params, mcts_cfg, net_cfg)."""
        if spec_str in ("random", "greedy", "human", "undefeated"):
            return (spec_str, None, None, None)
        base_net = NetConfig()
        if spec_str == "mcts0":
            cfg = Config()
            net = make_net(spec, base_net)
            return ("mcts", init_params(net, spec, key), cfg.mcts, base_net)
        cfg = load_config(spec_str)
        net = make_net(spec, cfg.net)
        template = init_params(net, spec, key)
        params, cfg2, _, _ = load_checkpoint(spec_str, template)
        return ("mcts", params, cfg2.mcts, cfg2.net)

    k = jax.random.PRNGKey(args.seed)
    ka, kb = jax.random.split(k)
    kind_a, pa, mca, neta = build(args.players[0], ka)
    kind_b, pb, mcb, netb = build(args.players[1], kb)

    mc = mca or mcb or MCTSConfig()
    if args.numMCTSSims:
        import dataclasses
        mc = dataclasses.replace(mc, num_sims=args.numMCTSSims)

    from alphazero_tpu.train.arena import ArenaResult

    def host_player(kind, params, mcfg, ncfg):
        from alphazero_tpu import players as pl
        if kind == "random":
            return pl.random_player(spec)
        if kind == "greedy":
            return pl.greedy_player(spec)
        if kind == "human":
            return pl.human_player(spec)
        if kind == "undefeated":
            from alphazero_tpu.games.akropolis_bot import UndefeatedPlayer
            return UndefeatedPlayer(spec)
        return pl.mcts_player(spec, make_net(spec, ncfg), params,
                              mcfg or mc)

    host_mode = args.verbose or "human" in (kind_a, kind_b) \
        or "undefeated" in (kind_a, kind_b)
    if host_mode:
        from alphazero_tpu.players import play_host_game
        pl_a = host_player(kind_a, pa, mca, neta)
        pl_b = host_player(kind_b, pb, mcb, netb)
        wins = [0, 0, 0]  # a, b, draws
        for g in range(args.num_games):
            seats = [pl_a, pl_b] if g % 2 == 0 else [pl_b, pl_a]
            result, moves = play_host_game(
                spec, seats + [pl_a] * (spec.num_players - 2),
                jax.random.PRNGKey(args.seed + g), verbose=args.verbose)
            ra = result[0] if g % 2 == 0 else result[1]
            wins[0 if ra > 0.5 else (1 if ra < -0.5 else 2)] += 1
            print(f"game {g}: result {result.tolist()} in {moves} moves")
        res = ArenaResult(*(int(w) for w in wins), 0)
    elif kind_a == "mcts" and kind_b == "mcts":
        net = make_net(spec, neta or netb)
        res = play_matches(spec, net, pa, pb, jax.random.PRNGKey(args.seed),
                           cfg=mc, num_games=args.num_games)
    elif "mcts" in (kind_a, kind_b) and "random" in (kind_a, kind_b):
        params, ncfg = (pa, neta) if kind_a == "mcts" else (pb, netb)
        net = make_net(spec, ncfg)
        r = play_vs_random(spec, net, params, jax.random.PRNGKey(args.seed),
                           cfg=mc, num_games=args.num_games)
        res = r if kind_a == "mcts" else \
            ArenaResult(r.two_wins, r.one_wins, r.draws, r.unfinished)
    elif "greedy" in (kind_a, kind_b) and "random" in (kind_a, kind_b):
        from alphazero_tpu.players import play_greedy_vs_random
        g, r_, d, u = play_greedy_vs_random(
            spec, jax.random.PRNGKey(args.seed), num_games=args.num_games)
        res = ArenaResult(g, r_, d, u) if kind_a == "greedy" else \
            ArenaResult(r_, g, d, u)
    else:
        raise SystemExit(f"unsupported matchup {kind_a} vs {kind_b} "
                         "(use --verbose for the host loop)")

    out = dict(one=args.players[0], two=args.players[1],
               one_wins=int(res.one_wins), two_wins=int(res.two_wins),
               draws=int(res.draws), unfinished=int(res.unfinished))
    print(json.dumps(out))

    if args.ratings:
        ratings = load_ratings(args.ratings)
        update_pair(ratings, args.players[0], args.players[1],
                    out["one_wins"], out["two_wins"], out["draws"])
        save_ratings(args.ratings, ratings)
        for name in (args.players[0], args.players[1]):
            r = ratings[name]
            print(f"{name}: glicko2 {r.rating:.0f} ± {r.rd:.0f}")


if __name__ == "__main__":
    main()
