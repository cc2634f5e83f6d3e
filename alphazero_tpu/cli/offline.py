"""Offline NN tooling — the reference's GenericNNetWrapper.__main__
(/root/reference/GenericNNetWrapper.py:347-441: supervised training on saved
examples, FLOP/param introspection) and Coach.__main__ replay-file surgery
(/root/reference/Coach.py:294-346: merge files, carve a test split, binarize
policies).

Subcommands:
  train    supervised training on a saved replay.npz (no self-play) with
           held-out validation loss (reference `evaluate`, :159-177)
  inspect  parameter count + XLA FLOPs/bytes of one forward pass (the
           fvcore analog)
  merge    concatenate several replay.npz files into one
  split    carve every k-th example into a test replay
  binarize rewrite policies as one-hot argmax (reference Coach.py:334-342)
"""

from __future__ import annotations

import argparse
import json
import logging

import numpy as np


_DENSE_KEYS = ("state", "pi", "z", "q", "valids")
_ENC_KEYS = ("state", "pi_vals", "pi_idx", "z", "q", "valids")


def _load_npz(path):
    """Returns the example arrays in whichever format the file holds:
    dense ('pi') or encoded ('pi_vals'/'pi_idx' sparse + packed valids,
    selfplay/codec.py).  Surgery commands operate on either directly."""
    d = np.load(path)
    keys = _DENSE_KEYS if "pi" in d else _ENC_KEYS
    return {k: d[k] for k in keys}


def _decode(arrays, num_actions: int):
    """Encoded -> dense host arrays (no-op on dense)."""
    if "pi" in arrays:
        return arrays
    from alphazero_tpu.selfplay.codec import densify_pi_np, unpack_bool_np
    return dict(state=arrays["state"],
                pi=densify_pi_np(arrays["pi_vals"], arrays["pi_idx"],
                                 num_actions).astype(np.float16),
                z=arrays["z"], q=arrays["q"],
                valids=unpack_bool_np(arrays["valids"], num_actions))


def _save_npz(path, arrays):
    n = arrays["state"].shape[0]
    k_pi = arrays["pi_vals"].shape[-1] if "pi_vals" in arrays else 0
    np.savez_compressed(path, meta=np.array([n % max(n, 1), n, n, k_pi]),
                        **arrays)


def cmd_train(args):
    import jax
    import jax.numpy as jnp
    from alphazero_tpu.config import Config, TrainConfig
    from alphazero_tpu.games import make_game
    from alphazero_tpu.models import init_params, make_net, param_count
    from alphazero_tpu.config import NetConfig
    from alphazero_tpu.train.learner import init_train_state, train_step

    spec = make_game(args.game, **json.loads(args.variant))
    net = make_net(spec, NetConfig(version=args.nn_version,
                                   channels=args.channels, depth=args.depth))
    params = init_params(net, spec, jax.random.PRNGKey(args.seed))
    d = _decode(_load_npz(args.replay), spec.num_actions)
    n = d["state"].shape[0]
    n_test = max(1, n // 10)
    test = {k: v[:n_test] for k, v in d.items()}
    trainset = {k: v[n_test:] for k, v in d.items()}
    n_train = n - n_test
    logging.info("replay %s: %d train / %d test, params %d",
                 args.replay, n_train, n_test, param_count(params))

    tc = TrainConfig(learn_rate=args.learn_rate, batch_size=args.batch_size)
    state = init_train_state(params, tc, args.steps)
    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)
    for step in range(args.steps):
        ids = rng.choice(n_train, size=min(args.batch_size, n_train),
                         replace=False)
        batch = {k: jnp.asarray(v[ids].astype(
            np.float32 if v.dtype == np.float16 else v.dtype))
            for k, v in trainset.items()}
        key, k = jax.random.split(key)
        state, m = train_step(spec, net, tc, args.steps, state, batch, k,
                              augment=False)
        if step % max(1, args.steps // 10) == 0:
            logging.info("step %d: loss %.4f (pi %.4f v %.4f)", step,
                         float(m.loss), float(m.loss_pi), float(m.loss_v))

    # held-out validation (reference evaluate)
    tb = {k: jnp.asarray(v.astype(
        np.float32 if v.dtype == np.float16 else v.dtype))
        for k, v in test.items()}
    _, m = train_step(spec, net, tc, args.steps, state, tb,
                      jax.random.PRNGKey(9), augment=False)
    print(json.dumps(dict(val_loss=float(m.loss),
                          val_loss_pi=float(m.loss_pi),
                          val_loss_v=float(m.loss_v))))
    if args.out:
        from alphazero_tpu.train.checkpoint import save_checkpoint
        cfg = Config()
        save_checkpoint(args.out, state.params, cfg)


def cmd_inspect(args):
    import jax
    import jax.numpy as jnp
    from alphazero_tpu.config import NetConfig
    from alphazero_tpu.games import make_game
    from alphazero_tpu.models import init_params, make_net, param_count
    from alphazero_tpu.utils.profiling import cost_stats

    spec = make_game(args.game, **json.loads(args.variant))
    net = make_net(spec, NetConfig(version=args.nn_version,
                                   channels=args.channels, depth=args.depth))
    params = init_params(net, spec, jax.random.PRNGKey(0))
    obs = jnp.zeros((args.batch_size, *spec.obs_shape), jnp.float32)
    valids = jnp.ones((args.batch_size, spec.num_actions), bool)
    stats = cost_stats(lambda p, o, v: net.apply(p, o, v), params, obs,
                       valids)
    print(json.dumps(dict(params=param_count(params),
                          batch=args.batch_size, **stats)))


def cmd_merge(args):
    parts = [_load_npz(p) for p in args.inputs]
    merged = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
    _save_npz(args.out, merged)
    print(f"merged {sum(p['state'].shape[0] for p in parts)} examples "
          f"-> {args.out}")


def cmd_split(args):
    d = _load_npz(args.replay)
    test = {k: v[::args.every] for k, v in d.items()}
    _save_npz(args.out, test)
    print(f"split {test['state'].shape[0]} examples -> {args.out}")


def cmd_binarize(args):
    d = _load_npz(args.replay)
    if "pi" in d:
        pi = d["pi"].astype(np.float32)
        hard = np.zeros_like(pi)
        hard[np.arange(pi.shape[0]), pi.argmax(-1)] = 1.0
        d["pi"] = hard.astype(np.float16)
        n = pi.shape[0]
    else:
        # encoded rows: keep the argmax action, zero the rest.  top-k values
        # are stored descending, so argmax = column 0 — but guard against
        # ties/reordering by recomputing it
        vals = d["pi_vals"].astype(np.float32)
        best = vals.argmax(-1)
        hard = np.zeros_like(vals)
        hard[np.arange(vals.shape[0]), best] = 1.0
        d = dict(d)
        d["pi_vals"] = hard.astype(np.float16)
        n = vals.shape[0]
    _save_npz(args.out, d)
    print(f"binarized {n} policies -> {args.out}")


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="alphazero_tpu offline tooling")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("game", nargs="?", default="santorini")
        sp.add_argument("--variant", default="{}")
        sp.add_argument("--nn-version", "-V", type=int, default=1)
        sp.add_argument("--channels", type=int, default=64)
        sp.add_argument("--depth", type=int, default=3)
        sp.add_argument("--batch-size", "-b", type=int, default=256)
        sp.add_argument("--cpu", action="store_true")

    t = sub.add_parser("train")
    common(t)
    t.add_argument("--replay", required=True)
    t.add_argument("--steps", type=int, default=200)
    t.add_argument("--learn-rate", type=float, default=1e-3)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--out", default=None, help="checkpoint dir to write")
    i = sub.add_parser("inspect")
    common(i)
    m = sub.add_parser("merge")
    m.add_argument("inputs", nargs="+")
    m.add_argument("--out", required=True)
    s = sub.add_parser("split")
    s.add_argument("replay")
    s.add_argument("--every", type=int, default=8)
    s.add_argument("--out", required=True)
    b = sub.add_parser("binarize")
    b.add_argument("replay")
    b.add_argument("--out", required=True)

    args = p.parse_args(argv)
    if getattr(args, "cpu", False):
        import jax
        jax.config.update("jax_platforms", "cpu")
    {"train": cmd_train, "inspect": cmd_inspect, "merge": cmd_merge,
     "split": cmd_split, "binarize": cmd_binarize}[args.cmd](args)


if __name__ == "__main__":
    main()
