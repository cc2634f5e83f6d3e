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

Modes beyond a single pairing:
  --tournament D1 D2 ...   round-robin over checkpoint dirs / specs with
                           glicko2 ratings (reference play_several_files,
                           pit.py:167-195)
  --age HOURS --root DIR   round-robin every */best modified in the last N
                           hours (reference play_age, pit.py:89-96)
  --score-file PATH        persist player one's winrate (the reference's
                           score.txt HPO channel, pit.py:77-84)
  --profile DIR            jax.profiler trace of the arena (the reference's
                           cProfile harness, pit.py:198-214)
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
    p.add_argument("players", nargs="*",
                   help="two player specs (ckpt dir | random | mcts0)")
    p.add_argument("--tournament", nargs="+", default=None,
                   help="round-robin these checkpoint dirs / specs")
    p.add_argument("--age", "-A", type=float, default=0,
                   help="tournament of every */best under --root modified "
                        "in the last AGE hours")
    p.add_argument("--root", default=".")
    p.add_argument("--score-file", default=None)
    p.add_argument("--profile", default=None,
                   help="write a jax.profiler trace of the arena here")
    p.add_argument("--state", default=None,
                   help=".npy board snapshot to start every game from "
                        "(fixed-position regression, reference "
                        "Arena.py:60-65 / pit.py:224)")
    p.add_argument("--num-games", "-n", type=int, default=64)
    p.add_argument("--reuse-tree", action="store_true",
                   help="carry each player's search tree across its moves "
                        "(reference MCTS persistence, MCTS.py:85-91)")
    p.add_argument("--host-arena", action="store_true",
                   help="drive the arena with a host move loop (per-move "
                        "jit programs) instead of one whole-game scan — "
                        "required for --reuse-tree on the TPU worker")
    p.add_argument("--numMCTSSims", "-m", type=int, default=0,
                   help="override sims (0 = use checkpoint value)")
    p.add_argument("--variant", default="{}")
    p.add_argument("--ratings", default=None,
                   help="glicko2 ratings JSON path to update")
    p.add_argument("--out", default=None,
                   help="append the result JSON (with checkpoint content "
                        "hashes) to this JSONL file — strength-evidence "
                        "artifacts tie to exact committed params")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--verbose", "-v", action="store_true",
                   help="host-loop play with board rendering per move")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.reuse_tree and not args.host_arena \
            and jax.default_backend() not in ("cpu",):
        # the whole-game reuse-tree arena scan faults the TPU worker
        # (docs/tpu_limits.md); auto-route to the host move loop instead of
        # letting the user crash the worker
        logging.info("reuse-tree on %s: auto-selecting the host arena "
                     "(whole-game reuse scan faults the TPU worker, "
                     "docs/tpu_limits.md)", jax.default_backend())
        args.host_arena = True

    from alphazero_tpu.config import Config, MCTSConfig, NetConfig
    from alphazero_tpu.games import make_game
    from alphazero_tpu.models import init_params, make_net
    from alphazero_tpu.train.arena import (play_matches_auto,
                                           play_matches_host,
                                           play_vs_random)
    from alphazero_tpu.train.checkpoint import load_checkpoint, load_config
    from alphazero_tpu.utils.ratings import (load_ratings, save_ratings,
                                             update_pair)

    variant = json.loads(args.variant)
    spec = make_game(args.game, **variant)

    if args.age > 0:
        import glob
        import time
        cutoff = time.time() - args.age * 3600
        args.tournament = sorted(
            d for d in glob.glob(os.path.join(args.root, "*", "best"))
            if os.path.getmtime(os.path.join(d, "params.msgpack")) >= cutoff)
        logging.info("age tournament: %s", args.tournament)

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

    from alphazero_tpu.train.arena import ArenaResult as _AR

    def run_pair(spec_a, spec_b, seed):
        """One pairing through the batched arenas; returns ArenaResult."""
        ka, kb = jax.random.split(jax.random.PRNGKey(seed))
        kind_a, pa, mca, neta = build(spec_a, ka)
        kind_b, pb, mcb, netb = build(spec_b, kb)
        mc_ = mca or mcb or MCTSConfig()
        if args.numMCTSSims:
            import dataclasses as _dc
            mc_ = _dc.replace(mc_, num_sims=args.numMCTSSims)
        if kind_a == "mcts" and kind_b == "mcts":
            matches = play_matches_host if args.host_arena \
                else play_matches_auto
            return matches(spec, make_net(spec, neta), pa, pb,
                           jax.random.PRNGKey(seed), cfg=mc_,
                           num_games=args.num_games,
                           net_b=make_net(spec, netb),
                           reuse_tree=args.reuse_tree)
        if "mcts" in (kind_a, kind_b) and "random" in (kind_a, kind_b):
            params, ncfg = (pa, neta) if kind_a == "mcts" else (pb, netb)
            net = make_net(spec, ncfg)
            r = play_vs_random(spec, net, params, jax.random.PRNGKey(seed),
                               cfg=mc_, num_games=args.num_games)
            return r if kind_a == "mcts" else                 _AR(r.two_wins, r.one_wins, r.draws, r.unfinished)
        raise SystemExit(f"unsupported pairing {kind_a} vs {kind_b}")

    if args.tournament:
        entries = list(args.tournament)
        ratings = load_ratings(args.ratings) if args.ratings else {}
        table = {e: [0, 0, 0] for e in entries}
        for i in range(len(entries)):
            for j in range(i + 1, len(entries)):
                res = run_pair(entries[i], entries[j], args.seed + 97 * i + j)
                w1, w2, dr = (int(res.one_wins), int(res.two_wins),
                              int(res.draws))
                table[entries[i]][0] += w1
                table[entries[i]][1] += w2
                table[entries[i]][2] += dr
                table[entries[j]][0] += w2
                table[entries[j]][1] += w1
                table[entries[j]][2] += dr
                update_pair(ratings, entries[i], entries[j], w1, w2, dr)
                print(f"{entries[i]} vs {entries[j]}: {w1}-{w2} ({dr} draws)")
        for e in sorted(entries, key=lambda x: -ratings[x].rating):
            w, l_, d = table[e]
            print(f"{e}: glicko2 {ratings[e].rating:.0f} "
                  f"± {ratings[e].rd:.0f}  ({w}W {l_}L {d}D)")
        if args.ratings:
            save_ratings(args.ratings, ratings)
        return

    if len(args.players) != 2:
        raise SystemExit("need two player specs (or --tournament/--age)")

    if args.profile:
        from alphazero_tpu.utils.profiling import trace as _trace
        import contextlib
        prof_cm = _trace(args.profile)
    else:
        import contextlib
        prof_cm = contextlib.nullcontext()

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

    start = None
    if args.state:
        import numpy as np
        start = np.load(args.state)

    host_mode = args.verbose or "human" in (kind_a, kind_b)
    prof_cm.__enter__()
    if not host_mode and "undefeated" in (kind_a, kind_b) \
            and "mcts" in (kind_a, kind_b):
        # batched hybrid arena: one device search per ply for every lane,
        # the scripted bot consulted on host (pinned to the CPU backend)
        from alphazero_tpu.games.akropolis_bot import UndefeatedPlayer
        from alphazero_tpu.players import play_matches_vs_host
        params, ncfg = (pa, neta) if kind_a == "mcts" else (pb, netb)
        r = play_matches_vs_host(
            spec, make_net(spec, ncfg), params,
            lambda: UndefeatedPlayer(spec, platform="cpu"),
            jax.random.PRNGKey(args.seed), cfg=mc,
            num_games=args.num_games)
        res = r if kind_a == "mcts" else \
            ArenaResult(r.two_wins, r.one_wins, r.draws, r.unfinished)
    elif host_mode or "undefeated" in (kind_a, kind_b):
        from alphazero_tpu.players import play_host_game
        pl_a = host_player(kind_a, pa, mca, neta)
        pl_b = host_player(kind_b, pb, mcb, netb)
        wins = [0, 0, 0]  # a, b, draws
        for g in range(args.num_games):
            seats = [pl_a, pl_b] if g % 2 == 0 else [pl_b, pl_a]
            result, moves = play_host_game(
                spec, seats + [pl_a] * (spec.num_players - 2),
                jax.random.PRNGKey(args.seed + g), verbose=args.verbose,
                start_state=start)
            ra = result[0] if g % 2 == 0 else result[1]
            wins[0 if ra > 0.5 else (1 if ra < -0.5 else 2)] += 1
            print(f"game {g}: result {result.tolist()} in {moves} moves")
        res = ArenaResult(*(int(w) for w in wins), 0)
    elif kind_a == "mcts" and kind_b == "mcts":
        matches = play_matches_host if args.host_arena \
                else play_matches_auto
        res = matches(spec, make_net(spec, neta), pa, pb,
                      jax.random.PRNGKey(args.seed),
                      cfg=mc, num_games=args.num_games,
                      net_b=make_net(spec, netb), init_state=start,
                      reuse_tree=args.reuse_tree)
    elif "mcts" in (kind_a, kind_b) and "random" in (kind_a, kind_b):
        params, ncfg = (pa, neta) if kind_a == "mcts" else (pb, netb)
        net = make_net(spec, ncfg)
        r = play_vs_random(spec, net, params, jax.random.PRNGKey(args.seed),
                           cfg=mc, num_games=args.num_games,
                           init_state=start)
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

    prof_cm.__exit__(None, None, None)
    out = dict(one=args.players[0], two=args.players[1],
               one_wins=int(res.one_wins), two_wins=int(res.two_wins),
               draws=int(res.draws), unfinished=int(res.unfinished),
               game=args.game, num_sims=int(mc.num_sims), seed=args.seed)
    from alphazero_tpu.train.checkpoint import params_hash
    for field, spec_str in (("one_hash", args.players[0]),
                            ("two_hash", args.players[1])):
        if os.path.exists(os.path.join(spec_str, "params.msgpack")):
            out[field] = params_hash(spec_str)
    print(json.dumps(out))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(out) + "\n")

    if args.score_file:
        decided = max(out["one_wins"] + out["two_wins"], 1)
        with open(args.score_file, "w") as f:
            f.write(str(out["one_wins"] / decided))

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
