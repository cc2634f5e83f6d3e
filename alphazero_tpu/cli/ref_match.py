"""Strength-anchor harness: play an alphazero_tpu checkpoint against the
UPSTREAM pretrained checkpoint, driven by the reference's own MCTS + torch
net (run as pure Python via the tests' numba/ort stubs).

This closes the BASELINE.md anchor loop for Santorini: the reference's
committed ``pretrained.pt`` is its glicko-2249 player
(/root/reference/santorini/README.md:44 + glicko_graph.csv), evaluated there
in "no god power" games with random initial positions (README.md:56-60).
That checkpoint is a 162-action NO-GODS net (head_PI.fc: (162, 50)), so
matches run in the plain no-gods engine: the reference side through its
NB_GODS=1-patched modules (the tests' import_reference_santorini), our side
through make_game("santorini", nb_gods=1, init_method=1).

Both engines step the SAME canonical states (bit-exact parity is what
tests/test_santorini_parity.py guarantees).  The reference player keeps
its MCTS dict across moves within a game (its normal tree reuse) and is
rebuilt per game.  Runs on CPU by design — the TPU can keep training while
this measures.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser(description="alphazero_tpu vs reference .pt")
    p.add_argument("checkpoint", help="our checkpoint dir")
    p.add_argument("--game",
                   choices=("santorini", "splendor", "abalone", "azul",
                            "minivilles"),
                   default="santorini")
    p.add_argument("--ref-dir", default=None)
    p.add_argument("--ref-file", default=None)
    p.add_argument("--num-games", "-n", type=int, default=20)
    p.add_argument("--sims", "-m", type=int, default=100,
                   help="simulations per move for OUR player")
    p.add_argument("--ref-sims", type=int, default=100,
                   help="simulations per move for the reference player "
                        "(its rating was earned at 800; pure-Python search "
                        "is ~100x slower than its numba build, so matched "
                        "reduced budgets keep wall time sane)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None, help="append JSON result here")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")

    import sys

    import numpy as np

    sys.path.insert(0, "/root/repo")
    from tests.reference_oracle import (REFERENCE_PATH, install_colorama_stub,
                                        install_numba_stub, install_ort_stub)
    install_numba_stub()
    install_colorama_stub()
    install_ort_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)

    # patched reference modules FIRST (the Game adapters bind logic and
    # constants at their own import time)
    if args.game == "santorini":
        from tests.reference_oracle import import_reference_santorini
        import_reference_santorini(nb_gods=1, init_method=1)
        args.ref_dir = args.ref_dir or "/root/reference/santorini"
        args.ref_file = args.ref_file or "pretrained.pt"
        import MCTS as MCTSmod
        import santorini.SantoriniGame as G
        from santorini.NNet import NNetWrapper
        ref_game = G.SantoriniGame()
        expect_actions = 162
        our_variant = dict(nb_gods=1, init_method=1)
    elif args.game == "azul":
        from tests.reference_oracle import import_reference_azul
        import_reference_azul()
        args.ref_dir = args.ref_dir or "/root/reference/azul"
        args.ref_file = args.ref_file or "pretrained.pt"
        import MCTS as MCTSmod
        import azul.AzulGame as G
        from azul.NNet import NNetWrapper
        ref_game = G.AzulGame()
        expect_actions = 180
        our_variant = {}
    elif args.game == "minivilles":
        from tests.reference_oracle import import_reference_minivilles
        import_reference_minivilles()
        args.ref_dir = args.ref_dir or "/root/reference/minivilles"
        args.ref_file = args.ref_file or "pretrained_2players.pt"
        import MCTS as MCTSmod
        import minivilles.MinivillesGame as G
        from minivilles.NNet import NNetWrapper
        ref_game = G.MinivillesGame()
        expect_actions = 21
        our_variant = dict(num_players=2)
    elif args.game == "abalone":
        from tests.reference_oracle import import_reference_abalone
        import_reference_abalone(initial_layout=1)
        args.ref_dir = args.ref_dir or "/root/reference/abalone"
        args.ref_file = args.ref_file or "pretrained_BelgianDaisy.pt"
        import MCTS as MCTSmod
        import abalone.AbaloneGame as G
        from abalone.NNet import NNetWrapper
        ref_game = G.AbaloneGame()
        expect_actions = 3402
        our_variant = dict(initial_layout=1)
    else:
        from tests.reference_oracle import import_reference_splendor
        import_reference_splendor(num_players=2)
        args.ref_dir = args.ref_dir or "/root/reference/splendor"
        args.ref_file = args.ref_file or "pretrained_2players.pt"
        import MCTS as MCTSmod
        import splendor.SplendorGame as G
        from splendor.NNet import NNetWrapper
        ref_game = G.SplendorGame()
        expect_actions = 81
        our_variant = dict(num_players=2)
    from utils import dotdict

    # --- reference player --------------------------------------------------
    assert ref_game.getActionSize() == expect_actions, ref_game.getActionSize()
    net = NNetWrapper(ref_game, dict(
        nn_version=-1, learn_rate=3e-4, dropout=0.3, epochs=2, batch_size=32,
        q_weight=0.5, no_compression=True, universes=0))
    net.device["inference"] = "cpu"      # torch path; ONNX is stubbed out
    net.load_checkpoint(args.ref_dir, args.ref_file)

    def make_ref_player():
        margs = dotdict(dict(
            numMCTSSims=args.ref_sims, prob_fullMCTS=1.0, ratio_fullMCTS=1,
            forced_playouts=False, universes=0, cpuct=float(net.args.get(
                "cpuct", 1.25)), fpu=float(net.args.get("fpu", 0.0)),
            dirichletAlpha=0.0, temperature=[1.0, 0.1, 1.0],
            no_mem_optim=False))
        mcts = MCTSmod.MCTS(ref_game, net, margs, dirichlet_noise=False)

        def play(state, key, move_number):
            probs, _, _ = mcts.getActionProb(
                np.array(state, copy=True), temp=0.0, force_full_search=True)
            return int(np.argmax(probs))

        return play

    # --- our player --------------------------------------------------------
    import dataclasses

    from alphazero_tpu import players as pl
    from alphazero_tpu.games import make_game
    from alphazero_tpu.models import init_params, make_net
    from alphazero_tpu.train.checkpoint import load_checkpoint, load_config
    import jax

    spec1 = make_game(args.game, **our_variant)
    cfg = load_config(args.checkpoint)
    our_net = make_net(spec1, cfg.net)
    params, _, _, _ = load_checkpoint(
        args.checkpoint, init_params(our_net, spec1, jax.random.PRNGKey(0)))
    mcfg = dataclasses.replace(cfg.mcts, num_sims=args.sims)
    our_player = pl.mcts_player(spec1, our_net, params, mcfg)

    def nogod_start(key):
        return np.array(spec1.init(key))

    # --- matches -----------------------------------------------------------
    from alphazero_tpu.players import play_host_game

    wins = [0, 0, 0]  # ours, ref, draws
    t0 = time.time()
    for g in range(args.num_games):
        ref_player = make_ref_player()   # fresh tree per game (Arena.py:99)
        seats = ([our_player, ref_player] if g % 2 == 0
                 else [ref_player, our_player])
        kg = jax.random.PRNGKey(args.seed + g)
        result, moves = play_host_game(
            spec1, seats, kg, verbose=False,
            start_state=nogod_start(jax.random.fold_in(kg, 7)))
        r_ours = result[0] if g % 2 == 0 else result[1]
        wins[0 if r_ours > 0.5 else (1 if r_ours < -0.5 else 2)] += 1
        print(f"game {g}: ours="
              f"{'W' if r_ours > 0.5 else 'L' if r_ours < -0.5 else 'D'} "
              f"in {moves} moves  (running {wins[0]}-{wins[1]}-{wins[2]})",
              flush=True)

    import hashlib

    from alphazero_tpu.train.checkpoint import params_hash
    with open(f"{args.ref_dir}/{args.ref_file}", "rb") as f:
        ref_sha = hashlib.sha256(f.read()).hexdigest()[:16]
    out = dict(ours=args.checkpoint, ref=f"{args.ref_dir}/{args.ref_file}",
               ours_sha=params_hash(args.checkpoint), ref_sha=ref_sha,
               game=args.game, seed=args.seed,
               our_sims=args.sims, ref_sims=args.ref_sims,
               our_wins=wins[0], ref_wins=wins[1], draws=wins[2],
               games=args.num_games, seconds=round(time.time() - t0, 1))
    print(json.dumps(out))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
