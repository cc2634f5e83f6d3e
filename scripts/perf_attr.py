#!/usr/bin/env python
"""Per-stage attribution of the self-play MCTS step at bench shapes.

Times, with R-scaling (two repeat counts, subtracted, carry-dependent bodies
so nothing hoists):
  sim    — one full search simulation (PUCT+walk+step+NN+expand+backup)
  tree   — the sim with NN eval stubbed to a broadcast (search passes only)
  nn     — net.apply alone
  game   — step_canonical+valids+terminal+observe alone
  walk   — walk_path alone (carried best)
Usage: python scripts/perf_attr.py [--batch 2048] [--sims 100] [--full-frac .25]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def timed(fn, carry, r1, r2):
    """Seconds per iteration via two repeat counts (fixed overhead cancels)."""
    import jax

    def run(r):
        c = carry
        t0 = time.perf_counter()
        c = fn(c, r)
        jax.block_until_ready(c)
        return time.perf_counter() - t0

    run(r1)  # compile
    run(r2)
    a, b = run(r1), run(r2)
    return (b - a) / (r2 - r1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--game", default="santorini")
    p.add_argument("--variant", default=None,
                   help='game variant JSON (santorini default: '
                        '{"nb_gods":1,"init_method":1})')
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--sims", type=int, default=100)
    p.add_argument("--channels", type=int, default=128)
    p.add_argument("--depth", type=int, default=6)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from alphazero_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import functools

    import jax.numpy as jnp

    from alphazero_tpu.config import MCTSConfig, NetConfig
    from alphazero_tpu.games import make_game
    from alphazero_tpu.models import init_params, make_net
    from alphazero_tpu.search import tree as T
    from alphazero_tpu.search.mcts import mcts_search

    import json
    B, S = args.batch, args.sims
    variant = (json.loads(args.variant) if args.variant else
               (dict(nb_gods=1, init_method=1)
                if args.game == "santorini" else {}))
    spec = make_game(args.game, **variant)
    net = make_net(spec, NetConfig(version=1, channels=args.channels,
                                   depth=args.depth))
    params = init_params(net, spec, jax.random.PRNGKey(0))
    mc = MCTSConfig(num_sims=S, q_dtype="bfloat16", prior_dtype="bfloat16")
    A, P = spec.num_actions, spec.num_players
    key = jax.random.PRNGKey(1)
    states = jax.vmap(spec.init)(jax.random.split(key, B))

    def real_eval(p_, obs, valids):
        log_pi, v = net.apply(p_, obs, valids)
        return jnp.exp(log_pi), v

    def stub_eval(p_, obs, valids):
        # depends on obs so the game step isn't dead-code-eliminated
        s = jnp.sum(obs, axis=tuple(range(1, obs.ndim)), keepdims=False)
        pr = jnp.where(valids, 1.0, 0.0)
        pr = pr / jnp.maximum(pr.sum(-1, keepdims=True), 1)
        return pr + 1e-9 * s[:, None], jnp.zeros((obs.shape[0], P)) + \
            1e-9 * s[:, None]

    def search_r(eval_fn):
        @functools.partial(jax.jit, static_argnames=("r",))
        def run(c, r):
            key, acc = c
            def body(i, cc):
                k, a = cc
                k = jax.random.fold_in(k, i)
                out, _ = mcts_search(
                    spec, eval_fn, params, states, k,
                    jnp.full((B,), S, jnp.int32), jnp.zeros((B,), bool),
                    jnp.full((B,), True), cfg=mc, num_sims_max=S,
                    use_noise=False)
                return k, a + jnp.sum(out.counts)
            return jax.lax.fori_loop(0, r, body, (key, acc))
        return run

    def report(name, t):
        print(f"  {name:24s} {t*1e6:9.1f} µs/it  -> {B/t:12.0f} sims/s-equiv",
              flush=True)

    print(f"game={spec.name} B={B} S={S}  (per-sim seconds; sims/s = B/t)",
          flush=True)
    # --- full search & tree-only (stub NN) ---------------------------------
    c0 = (key, jnp.float32(0))
    t_full = timed(search_r(real_eval), c0, 2, 4) / S
    report("full sim", t_full)
    t_tree = timed(search_r(stub_eval), c0, 2, 4) / S
    report("tree-only sim", t_tree)

    # --- NN alone ----------------------------------------------------------
    obs = jax.vmap(spec.observe)(states)
    valids = jax.vmap(spec.valids)(states)

    @functools.partial(jax.jit, static_argnames=("r",))
    def nn_r(c, r):
        def body(i, o):
            log_pi, v = net.apply(params, o, valids)
            return o + 1e-9 * jnp.sum(v)          # carry-dependent
        return jax.lax.fori_loop(0, r, body, c)

    t_nn = timed(nn_r, obs.astype(jnp.float32), 4, 12)
    report("nn eval", t_nn)

    # --- game kernels alone ------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("r",))
    def game_r(c, r):
        def body(i, s):
            k = jax.random.fold_in(key, i)
            a = jnp.argmax(jax.vmap(spec.valids)(s), -1).astype(jnp.int32)
            ns, _ = jax.vmap(spec.step_canonical)(
                s, a, jax.random.split(k, B), jnp.zeros((B,), jnp.int32))
            _ = jax.vmap(spec.terminal)(ns)
            o = jax.vmap(spec.observe)(ns)
            return jnp.where(jnp.sum(o) > -1e9, ns, s)
        return jax.lax.fori_loop(0, r, body, c)

    t_game = timed(game_r, states, 4, 12)
    report("game kernels", t_game)

    # --- walk alone (on a grown tree) --------------------------------------
    trees = T.make_tree(spec, B, S + 1, jnp.bfloat16, jnp.bfloat16)
    pr0, v0 = stub_eval(params, jax.vmap(spec.observe)(states), valids)
    trees = T.init_root(trees, states, valids, pr0, v0[:, 0])

    @functools.partial(jax.jit, static_argnames=("r",))
    def walk_r(c, r):
        def body(i, cc):
            tr, acc = cc
            best, code = T.dense_best_action(tr, mc.cpuct, mc.fpu,
                                             jnp.full((B,), True), i + 1)
            w = T.walk_path(tr, best, code)
            return tr, acc + jnp.sum(w.depth)
        return jax.lax.fori_loop(0, r, body, (c, jnp.int32(0)))

    t_walkpuct = timed(walk_r, trees, 4, 12)
    report("puct+walk (root tree)", t_walkpuct)
    print(f"  nn share ≈ {100*(t_full-t_tree)/t_full:.1f}%  "
          f"(full {B/t_full:.0f} sims/s)", flush=True)


if __name__ == "__main__":
    main()
