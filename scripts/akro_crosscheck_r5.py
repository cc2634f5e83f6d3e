"""Akropolis anchor cross-check (round 5): the REFERENCE's committed
pretrained_2pl.pt vs OUR Undefeated-bot implementation, in OUR engine.

Both the r3 and the full-spec r5 retrains lose 0-32 to the bot, while the
reference reports ~75%+ for ITS net vs ITS bot (README.md:80-86).  This
harness separates the hypotheses:
  - reference net wins ~75% here  -> the harness/bot are calibrated; our
    nets are genuinely far below the reference's (a training-budget gap)
  - reference net also loses ~0%  -> our bot (or result attribution) is
    stronger/buggier than the reference's, and the 0-32 rows mis-measure
    our nets

The reference net plays through the reference's own MCTS (pure-Python via
stubs, like cli/ref_match.py); our engine steps the shared canonical
states (parity: tests/test_akropolis_parity.py); the bot is the committed
decision-matched UndefeatedPlayer (tests/test_akropolis_bot.py).

Usage: python scripts/akro_crosscheck_r5.py [-n 16] [--ref-sims 100]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-n", "--num-games", type=int, default=16)
    p.add_argument("--ours", default=None,
                   help="our checkpoint dir: play OUR net (mcts_player at "
                   "--our-sims) against the REFERENCE net instead of the "
                   "Undefeated bot — the direct net-vs-net parity measure")
    p.add_argument("--our-sims", type=int, default=100)
    p.add_argument("--ref-sims", type=int, default=100)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from tests.reference_oracle import (REFERENCE_PATH,
                                        install_colorama_stub,
                                        install_numba_stub,
                                        install_ort_stub)
    install_numba_stub()
    install_colorama_stub()
    install_ort_stub()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    for mod in list(sys.modules):
        if mod.startswith("akropolis"):
            del sys.modules[mod]
    import MCTS as MCTSmod
    import akropolis.AkropolisGame as G
    from akropolis.NNet import NNetWrapper
    from utils import dotdict

    ref_game = G.AkropolisGame()
    net = NNetWrapper(ref_game, dict(
        nn_version=-1, learn_rate=3e-4, dropout=0.3, epochs=2, batch_size=32,
        q_weight=0.5, no_compression=True, universes=0))
    net.device["inference"] = "cpu"
    net.load_checkpoint("/root/reference/akropolis", "pretrained_2pl.pt")
    print("reference net version:", net.nnet.version, flush=True)

    def make_ref_player():
        margs = dotdict(dict(
            numMCTSSims=args.ref_sims, prob_fullMCTS=1.0, ratio_fullMCTS=1,
            forced_playouts=False, universes=0,
            cpuct=float(net.args.get("cpuct", 1.25)),
            fpu=float(net.args.get("fpu", 0.0)),
            dirichletAlpha=0.0, temperature=[1.0, 0.1, 1.0],
            no_mem_optim=False))
        mcts = MCTSmod.MCTS(ref_game, net, margs, dirichlet_noise=False)

        def play(state, key, move_number):
            probs, _, _ = mcts.getActionProb(
                np.array(state, copy=True), temp=0.0, force_full_search=True)
            return int(np.argmax(probs))

        return play

    from alphazero_tpu.games import make_game
    from alphazero_tpu.games.akropolis_bot import UndefeatedPlayer
    from alphazero_tpu.players import play_host_game

    spec = make_game("akropolis")
    if args.ours:
        import dataclasses

        from alphazero_tpu import players as pl
        from alphazero_tpu.models import init_params, make_net
        from alphazero_tpu.train.checkpoint import (load_checkpoint,
                                                    load_config)
        cfg = load_config(args.ours)
        our_net = make_net(spec, cfg.net)
        params, _, _, _ = load_checkpoint(
            args.ours, init_params(our_net, spec, jax.random.PRNGKey(0)))
        mcfg = dataclasses.replace(cfg.mcts, num_sims=args.our_sims)

        def make_opponent():
            return pl.mcts_player(spec, our_net, params, mcfg)
        opp_name = args.ours
    else:
        def make_opponent():
            return UndefeatedPlayer(spec, platform="cpu")
        opp_name = "undefeated bot"
    wins = [0, 0, 0]  # ref net, opponent, draws
    t0 = time.time()
    for g in range(args.num_games):
        ref_player = make_ref_player()
        bot = make_opponent()
        seats = [ref_player, bot] if g % 2 == 0 else [bot, ref_player]
        result, moves = play_host_game(spec, seats,
                                       jax.random.PRNGKey(args.seed + g))
        r_ref = result[0] if g % 2 == 0 else result[1]
        wins[0 if r_ref > 0.5 else (1 if r_ref < -0.5 else 2)] += 1
        print(f"game {g}: ref_net="
              f"{'W' if r_ref > 0.5 else 'L' if r_ref < -0.5 else 'D'} "
              f"in {moves} moves (running ref {wins[0]} - bot {wins[1]} - "
              f"{wins[2]})", flush=True)

    out = dict(matchup=f"reference pretrained_2pl vs {opp_name}",
               game="akropolis", ref_sims=args.ref_sims,
               ref_net_wins=wins[0], bot_wins=wins[1], draws=wins[2],
               games=args.num_games, seed=args.seed,
               seconds=round(time.time() - t0, 1))
    print(json.dumps(out), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
