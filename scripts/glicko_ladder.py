#!/usr/bin/env python
"""Glicko-2 training-curve ladder (VERDICT r1 item 2 / BASELINE anchors).

Round-robins a sample of training checkpoints plus the uniform-random
baseline through the batched arena, rates the pool with glicko2, then
anchors the scale by pinning the random player at 843 — the reference's
published random-player rating (/root/reference/santorini/README.md:44),
so curve values are directly comparable to its glicko_graph.csv anchors
(random 843 +- 110, committed pretrained 2249 +- 95).

Writes ladder JSON + a markdown table.
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")

RANDOM_ANCHOR = 843.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run_dir", help="training dir with iter_*/ checkpoints")
    p.add_argument("--stride", type=int, default=4,
                   help="rate every k-th accepted checkpoint")
    p.add_argument("--games", type=int, default=128)
    p.add_argument("--sims", type=int, default=100)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    from alphazero_tpu.games import make_game
    from alphazero_tpu.models import init_params, make_net
    from alphazero_tpu.train.arena import play_matches, play_vs_random
    from alphazero_tpu.train.checkpoint import load_checkpoint, load_config
    from alphazero_tpu.utils.ratings import update_pair

    iters = sorted(glob.glob(os.path.join(args.run_dir, "iter_*")))
    entries = iters[args.stride - 1::args.stride]
    if iters and iters[-1] not in entries:
        entries.append(iters[-1])
    print(f"ladder over {len(entries)} checkpoints + random", flush=True)

    cfg0 = load_config(entries[0])
    spec = make_game(cfg0.game.name, **cfg0.game.variant)
    nets, params = {}, {}
    for e in entries:
        c = load_config(e)
        nets[e] = make_net(spec, c.net)
        params[e], _, _, _ = load_checkpoint(
            e, init_params(nets[e], spec, jax.random.PRNGKey(0)))
    mc = dataclasses.replace(cfg0.mcts, num_sims=args.sims)

    ratings = {}
    table = []

    def record(a, b, one, two, dr):
        update_pair(ratings, a, b, one, two, dr)
        table.append((a, b, one, two, dr))
        print(f"{os.path.basename(a)} vs {os.path.basename(b)}: "
              f"{one}-{two} ({dr} draws)", flush=True)

    # each checkpoint vs random + a FULL round-robin over the sampled pool.
    # A chained neighbors-only graph lets glicko drift along the chain
    # (non-transitive late nets rated only vs their own lineage); with the
    # device arena a pairing costs seconds, so density is free.
    for i, e in enumerate(entries):
        res = play_vs_random(spec, nets[e], params[e],
                             jax.random.PRNGKey(11 + i), cfg=mc,
                             num_games=args.games)
        record(e, "random", int(res.one_wins), int(res.two_wins),
               int(res.draws))
        for j in range(i):
            res = play_matches(spec, nets[e], params[e],
                               params[entries[j]],
                               jax.random.PRNGKey(101 + 13 * i + j),
                               cfg=mc, num_games=args.games,
                               net_b=nets[entries[j]])
            record(e, entries[j], int(res.one_wins), int(res.two_wins),
                   int(res.draws))

    from alphazero_tpu.train.checkpoint import params_hash
    shift = RANDOM_ANCHOR - ratings["random"].rating
    out = dict(anchor=dict(name="random", rating=RANDOM_ANCHOR),
               sims=args.sims, games_per_pair=args.games,
               ladder=[dict(name=os.path.basename(e),
                            sha=(params_hash(e) if e != "random" else None),
                            glicko=round(ratings[e].rating + shift, 1),
                            rd=round(ratings[e].rd, 1))
                       for e in entries + ["random"]])
    print(json.dumps(out, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
