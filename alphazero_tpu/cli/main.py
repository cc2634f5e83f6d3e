"""Training CLI — the reference's main.py re-expressed over the Config tree.

Flag names follow /root/reference/main.py:120-157 where they carry over.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys


def build_config(argv=None):
    from alphazero_tpu.config import (Config, GameConfig, MCTSConfig,
                                      NetConfig, SelfPlayConfig, TrainConfig)

    p = argparse.ArgumentParser(description="alphazero_tpu trainer")
    p.add_argument("game", nargs="?", default="santorini")
    p.add_argument("--checkpoint", "-C", default="./checkpoints")
    p.add_argument("--load-folder", "-L", default=None,
                   help="checkpoint dir to resume from")
    p.add_argument("--variant", default="{}",
                   help='game variant kwargs as JSON, e.g. \'{"nb_gods":1}\'')

    p.add_argument("--numIters", "-n", type=int, default=50)
    p.add_argument("--numEps", "-e", type=int, default=2048,
                   help="self-play games per iteration")
    p.add_argument("--numMCTSSims", "-m", type=int, default=100)
    p.add_argument("--tempThreshold", "-T", type=int, default=10)
    p.add_argument("--temperature", "-t", type=float, nargs=3,
                   default=[1.0, 0.1, 1.1])
    p.add_argument("--cpuct", "-c", type=float, default=1.25)
    p.add_argument("--dirichletAlpha", "-d", type=float, default=-1)
    p.add_argument("--fpu", "-f", type=float, default=0.0)
    p.add_argument("--forced-playouts", "-F", action="store_true")
    p.add_argument("--ratio-fullMCTS", type=int, default=5)
    p.add_argument("--prob-fullMCTS", type=float, default=0.25)
    p.add_argument("--universes", "-u", type=int, default=1)
    p.add_argument("--max-depth", type=int, default=0,
                   help="tree descent depth cap (0 = unbounded/exact "
                   "search — the dense engine's cost no longer grows with "
                   "descent depth); capped revisits back up the stored Q")
    p.add_argument("--arena-stages", type=int, default=4,
                   help="sim-scan stages over growing node arenas (compute "
                        "saver); 1 compiles the smallest per-move program "
                        "(engines near the TPU size fault, docs/tpu_limits.md)")
    p.add_argument("--pcr-merged", action="store_true",
                   help="run PCR full+fast lanes in ONE per-lane-budget "
                        "search instead of two right-sized ones: ~half the "
                        "compiled per-move body, more device compute")
    p.add_argument("--dyn-stages", type=int, default=1,
                   help=">1: run the dyn sim while_loop in k width stages "
                        "(bit-exact staging savings; k tunnel compiles)")
    p.add_argument("--dyn", action="store_true",
                   help="dynamic self-play: data-dependent move while_loop "
                        "(+ dyn_sims) — ONE small compiled program with "
                        "on-device quota exit; the scan-fault escape path "
                        "(docs/tpu_limits.md)")
    p.add_argument("--tree-dtype", default="bfloat16",
                   help="search-tree prior/q storage dtype (bfloat16 halves "
                   "the per-simulation dense passes; float32 = parity-test "
                   "configuration)")

    p.add_argument("--learn-rate", "-l", type=float, default=2e-3)
    p.add_argument("--lr-anneal-iters", type=int, default=0,
                   help=">0: anneal the OneCycle peak LR log-linearly from "
                        "--learn-rate to --lr-final over this many "
                        "iterations (reference staged recipe, "
                        "README.md:157-163); 0 = restart at the same peak "
                        "every iteration")
    p.add_argument("--lr-final", type=float, default=2e-4)
    p.add_argument("--epochs", "-p", type=int, default=4)
    p.add_argument("--batch-size", "-b", type=int, default=512)
    p.add_argument("--nn-version", "-V", type=int, default=1)
    p.add_argument("--channels", type=int, default=128)
    p.add_argument("--depth", type=int, default=6)
    p.add_argument("--q-weight", "-q", type=float, default=0.5)
    p.add_argument("--value-loss-weight", type=float, default=0.25,
                   help="weight of the value MSE in the total loss "
                        "(reference surprise_weight analog, 0.25; the "
                        "round-5 value-head study measures raising it)")
    p.add_argument("--updateThreshold", type=float, default=0.55)
    p.add_argument("--arenaCompare", type=int, default=300)
    p.add_argument("--stop-after-N-fail", "-s", type=int, default=25)
    p.add_argument("--selfplay-batch", "-P", type=int, default=256,
                   help="parallel self-play games (lockstep lanes)")
    p.add_argument("--scan-moves", type=int, default=0,
                   help="moves per self-play scan (0 = game max length)")
    p.add_argument("--replay-capacity", type=int, default=500_000)
    p.add_argument("--numItersHistory", "-i", type=int, default=0,
                   help=">0: train only on the newest N iterations' "
                        "examples (reference drop-oldest history); "
                        "0 = whole replay ring")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--smoke", action="store_true",
                   help="tiny end-to-end run for verification")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--profile", default=None,
                   help="jax.profiler trace dir: warm-up iteration, then "
                        "one traced iteration (reference main.py:86-116)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize() so the "
                        "coach mesh spans all hosts' devices (ICI/DCN "
                        "collectives via GSPMD)")
    args = p.parse_args(argv)

    if args.smoke:
        args.numIters = 1
        args.numEps = 8
        args.numMCTSSims = 12
        args.selfplay_batch = 8
        args.arenaCompare = 4
        args.channels, args.depth = 16, 1
        args.batch_size, args.epochs = 32, 1

    cfg = Config(
        game=GameConfig(name=args.game, variant=json.loads(args.variant)),
        mcts=MCTSConfig(
            num_sims=args.numMCTSSims, cpuct=args.cpuct, fpu=args.fpu,
            dirichlet_alpha=args.dirichletAlpha,
            temp_soft=args.temperature[2],
            forced_playouts=args.forced_playouts,
            ratio_full=args.ratio_fullMCTS, prob_full=args.prob_fullMCTS,
            universes=args.universes, max_depth=args.max_depth,
            q_dtype=args.tree_dtype, prior_dtype=args.tree_dtype,
            arena_stages=args.arena_stages, dyn_sims=args.dyn,
            dyn_stages=args.dyn_stages),
        selfplay=SelfPlayConfig(
            batch_size=args.selfplay_batch, temp_begin=args.temperature[0],
            temp_end=args.temperature[1], temp_half_life=args.tempThreshold,
            scan_moves=args.scan_moves, pcr_split=not args.pcr_merged,
            dyn=args.dyn),
        train=TrainConfig(
            learn_rate=args.learn_rate,
            lr_anneal_iters=args.lr_anneal_iters, lr_final=args.lr_final,
            epochs=args.epochs,
            batch_size=args.batch_size, q_weight=args.q_weight,
            value_loss_weight=args.value_loss_weight,
            replay_capacity=args.replay_capacity, num_iters=args.numIters,
            num_iters_history=args.numItersHistory,
            games_per_iter=args.numEps,
            update_threshold=args.updateThreshold,
            arena_games=args.arenaCompare,
            stop_after_n_fail=args.stop_after_N_fail),
        net=NetConfig(version=args.nn_version, channels=args.channels,
                      depth=args.depth),
        seed=args.seed, checkpoint_dir=args.checkpoint)
    return cfg, args


def main(argv=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    cfg, args = build_config(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from alphazero_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    # timestamped "Compiling <fn>" lines in the train log: in-run sims/s
    # swings (35k-203k in the round-4 recipe) are only diagnosable if the
    # log shows WHICH iterations paid a (re)compile vs a cache hit
    jax.config.update("jax_log_compiles", True)
    if args.distributed:
        jax.distributed.initialize()

    from alphazero_tpu.config import diff_configs
    from alphazero_tpu.train.checkpoint import load_config
    from alphazero_tpu.train.coach import Coach

    coach = Coach(cfg)
    if args.load_folder:
        old_cfg, transferred = coach.load(args.load_folder)
        # settings diff on resume (reference main.py:64-83)
        for k, ov, nv in diff_configs(old_cfg.to_dict(), cfg.to_dict()):
            logging.info("config change: %s: %s -> %s", k, ov, nv)
        if transferred:
            logging.info("knowledge transfer applied; first self-play skipped")

    if jax.process_index() == 0:
        os.makedirs(cfg.checkpoint_dir, exist_ok=True)
        with open(os.path.join(cfg.checkpoint_dir, "settings.json"),
                  "w") as f:
            f.write(cfg.to_json())

    if args.profile:
        from alphazero_tpu.utils.profiling import trace
        coach.run_iteration()                 # warm-up (compile)
        with trace(args.profile):
            coach.run_iteration()
        logging.info("profile trace written to %s", args.profile)
    history = coach.learn()
    if jax.process_index() == 0:
        with open(os.path.join(cfg.checkpoint_dir, "history.json"),
                  "w") as f:
            json.dump(history, f, indent=2, default=str)
    print(json.dumps(history[-1], default=str))


if __name__ == "__main__":
    main()
