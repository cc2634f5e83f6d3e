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
    p.add_argument("--skip-santorini", action="store_true")
    p.add_argument("--skip-splendor", action="store_true")
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

    import functools

    import jax.numpy as jnp

    from alphazero_tpu.search.mcts import (argmax_action, clamp_to_valid,
                                           run_mcts, temp_for_game)

    def host_duel(spec, net, params, exact, capped, num_games, key):
        """Batched duel driven by a host move loop: per move, both search
        configs run as separate (small, cacheable) device programs — the
        single giant scan-of-two-searches program trips a TPU kernel fault
        on this platform."""
        B, P = num_games, spec.num_players

        def eval_fn(p, obs, valids):
            log_pi, v = net.apply(p, obs, valids)
            return jnp.exp(log_pi), v

        step_j = jax.jit(lambda s, a, k: jax.vmap(
            lambda s_, a_, k_: spec.step_canonical(
                s_, a_, k_, jnp.int32(0)))(s, a, jax.random.split(k, B)))
        term_j = jax.jit(jax.vmap(spec.terminal))
        states = jax.vmap(spec.init)(jax.random.split(key, B))
        seat_a = jnp.arange(B) % P
        cur = jnp.zeros((B,), jnp.int32)
        done = jnp.zeros((B,), bool)
        result = jnp.zeros((B, P), jnp.float32)
        nb = jnp.zeros((B,), bool)
        for t in range(spec.max_game_length):
            kt = jax.random.fold_in(key, 17 + t)
            outs = {}
            for tag, c in (("a", exact), ("b", capped)):
                outs[tag] = run_mcts(
                    spec, eval_fn, states, kt,
                    budgets=jnp.where(done, 1, c.num_sims).astype(jnp.int32),
                    noise_mask=nb, forced_mask=jnp.full((B,), c.forced_playouts),
                    cfg=c, num_sims_max=c.num_sims, use_noise=False,
                    eval_args=params)
            temp = temp_for_game(10, float(t + 1))
            acts = {tag: clamp_to_valid(
                argmax_action(jax.random.fold_in(kt, 3), o.counts,
                              jnp.float32(temp)), o.root_valids)
                for tag, o in outs.items()}
            use_a = cur == seat_a
            action = jnp.where(use_a, acts["a"], acts["b"])
            nxt, swap = step_j(states, action, jax.random.fold_in(kt, 5))
            term = term_j(nxt)
            ndone = jnp.any(term != 0, axis=-1)
            nplayer = (cur + swap) % P
            res_abs = jax.vmap(jnp.roll)(term, nplayer)
            keep = done.reshape((B,) + (1,) * (states.ndim - 1))
            states = jnp.where(keep, states, nxt)
            result = jnp.where(done[:, None], result, res_abs)
            cur = jnp.where(done, cur, nplayer)
            done = done | ndone
            if bool(jnp.all(done)):
                break
        import numpy as np
        res_a = np.take_along_axis(np.asarray(result),
                                   np.asarray(seat_a)[:, None], axis=1)[:, 0]
        d = np.asarray(done)
        return (int(((res_a > 0.5) & d).sum()), int(((res_a < -0.5) & d).sum()),
                int(((np.abs(res_a) <= 0.5) & d).sum()))

    def duel(name, spec, net, params, base_cfg, cap):
        exact = dataclasses.replace(base_cfg, num_sims=args.sims, max_depth=0)
        capped = dataclasses.replace(base_cfg, num_sims=args.sims,
                                     max_depth=cap)
        one, two, dr = host_duel(spec, net, params, exact, capped,
                                 args.games, jax.random.PRNGKey(7))
        dec = max(one + two, 1)
        # Elo difference from winrate (draws as half)
        import math
        wr = (one + 0.5 * dr) / max(one + two + dr, 1)
        wr = min(max(wr, 1e-6), 1 - 1e-6)
        elo = 400 * math.log10(wr / (1 - wr))
        out = dict(matchup=f"{name}: exact vs cap{cap}", sims=args.sims,
                   games=args.games, exact_wins=one, capped_wins=two,
                   draws=dr, unfinished=args.games - one - two - dr,
                   exact_winrate=round(wr, 4), elo_exact_minus_capped=round(elo, 1))
        print(json.dumps(out), flush=True)
        results.append(out)

    # Santorini (trained net when available)
    spec_s = make_game("santorini", nb_gods=1, init_method=1)
    if args.skip_santorini:
        pass
    elif args.ckpt:
        cfg = load_config(args.ckpt)
        net_s = make_net(spec_s, cfg.net)
        params_s, _, _, _ = load_checkpoint(
            args.ckpt, init_params(net_s, spec_s, jax.random.PRNGKey(0)))
        base_s = cfg.mcts
    else:
        net_s = make_net(spec_s, NetConfig(version=1, channels=64, depth=3))
        params_s = init_params(net_s, spec_s, jax.random.PRNGKey(0))
        base_s = MCTSConfig()
    if not args.skip_santorini:
        for cap in args.caps:
            duel("santorini", spec_s, net_s, params_s, base_s, cap)

    # Splendor (chance game; untrained net isolates pure search semantics)
    if not args.skip_splendor:
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
