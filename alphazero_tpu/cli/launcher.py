"""Game-logic test harness — golden-trace dump/replay + infinite-loop smell.

The reference's launcher.py (/root/reference/launcher.py:17-186): `--play`
dumps per-move JSON (before, player, valids, action, after) from random
playthroughs; `--tests` replays dumps through the current engine and diffs;
`--loops` flags states where the previous action is still legal (rule-bug
smell).  Traces written by one engine version pin the behavior of the next.
"""

from __future__ import annotations

import argparse
import json
import os
from glob import glob


def play_one_game(spec, game_seed: int, dump_dir=None):
    import numpy as np
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(game_seed)
    valids_f = jax.jit(spec.valids)
    term_f = jax.jit(spec.terminal)
    step_f = jax.jit(lambda s, a: spec.step_canonical(
        s, a, jax.random.PRNGKey(game_seed), jnp.int32(0)))

    state = np.asarray(spec.init(jax.random.PRNGKey(game_seed)))
    moves = []
    prev_action = None
    loop_smells = 0
    for ply in range(spec.max_game_length):
        v = np.asarray(valids_f(state))
        t = np.asarray(term_f(state))
        if t.any() or not v.any():
            break
        if prev_action is not None and v[prev_action]:
            loop_smells += 1
        action = int(rng.choice(np.flatnonzero(v)))
        nxt, swap = step_f(state, jnp.int32(action))
        nxt = np.asarray(nxt)
        moves.append(dict(before=state.tolist(), valids=v.tolist(),
                          action=action, swap=int(swap), after=nxt.tolist()))
        prev_action = action if int(swap) == 0 else None
        state = nxt

    if dump_dir:
        os.makedirs(dump_dir, exist_ok=True)
        with open(os.path.join(dump_dir, f"game_{game_seed:04d}.json"),
                  "w") as f:
            json.dump(dict(game=spec.name, seed=game_seed, moves=moves), f)
    return moves, loop_smells


def replay_dump(spec, path: str) -> int:
    """Replay a dumped game; returns number of divergences."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    with open(path) as f:
        dump = json.load(f)
    valids_f = jax.jit(spec.valids)
    step_f = jax.jit(lambda s, a: spec.step_canonical(
        s, a, jax.random.PRNGKey(dump["seed"]), jnp.int32(0)))

    errors = 0
    for i, mv in enumerate(dump["moves"]):
        before = np.asarray(mv["before"], np.int8)
        v = np.asarray(valids_f(jnp.asarray(before)))
        if v.tolist() != mv["valids"]:
            print(f"{path}: move {i}: valid-move vector diverges")
            errors += 1
        nxt, swap = step_f(jnp.asarray(before), jnp.int32(mv["action"]))
        if np.asarray(nxt).tolist() != mv["after"]:
            print(f"{path}: move {i}: post-state diverges "
                  f"(action {mv['action']})")
            errors += 1
        if int(swap) != mv["swap"]:
            print(f"{path}: move {i}: player swap diverges")
            errors += 1
    return errors


def main(argv=None):
    p = argparse.ArgumentParser(description="game-logic golden-trace harness")
    p.add_argument("game", nargs="?", default="santorini")
    p.add_argument("--variant", default="{}")
    p.add_argument("--play", type=int, default=0, metavar="N",
                   help="dump N random games")
    p.add_argument("--tests", action="store_true",
                   help="replay all dumps for this game")
    p.add_argument("--dump-dir", default=None)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from alphazero_tpu.games import make_game
    spec = make_game(args.game, **json.loads(args.variant))
    dump_dir = args.dump_dir or os.path.join("dumps", spec.name)

    if args.play:
        total_smells = 0
        for seed in range(args.play):
            moves, smells = play_one_game(spec, seed, dump_dir)
            total_smells += smells
            print(f"game {seed}: {len(moves)} moves, {smells} loop-smells")
        print(f"dumped {args.play} games to {dump_dir} "
              f"({total_smells} loop smells)")
    elif args.tests:
        files = sorted(glob(os.path.join(dump_dir, "game_*.json")))
        if not files:
            raise SystemExit(f"no dumps under {dump_dir}; run --play first")
        errors = sum(replay_dump(spec, f) for f in files)
        print(f"replayed {len(files)} games: "
              f"{'OK' if errors == 0 else f'{errors} DIVERGENCES'}")
        raise SystemExit(1 if errors else 0)
    else:
        p.print_help()


if __name__ == "__main__":
    main()
