"""Population-Based Training CLI — the reference's useRay.py entry point
(/root/reference/useRay.py:56-82) without Ray: K in-process trials sharing
the accelerator, exploit/explore on arena winrates."""

from __future__ import annotations

import argparse
import json
import logging
import os


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description="alphazero_tpu HPO")
    p.add_argument("game", nargs="?", default="santorini")
    p.add_argument("--scheduler", choices=("pbt", "asha"), default="pbt",
                   help="pbt: population-based training; asha: asynchronous "
                        "successive halving (reference useRay.py --scheduler; "
                        "PB2 intentionally not reproduced, see "
                        "train/population.py AshaTrainer docstring)")
    p.add_argument("--population", "-k", type=int, default=4)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--exploit-interval", type=int, default=2)
    p.add_argument("--num-samples", type=int, default=16,
                   help="ASHA: total configurations to try")
    p.add_argument("--grace", type=int, default=1,
                   help="ASHA: iterations before the first cut")
    p.add_argument("--max-t", type=int, default=4,
                   help="ASHA: iterations per surviving trial")
    p.add_argument("--time-lr", nargs=3, type=float, default=None,
                   metavar=("START", "END", "HOURS"),
                   help="wall-clock log-interpolated learning rate "
                        "(reference rayConfig.compute_lr, 3e-4 1e-5 72)")
    p.add_argument("--games-per-iter", type=int, default=256)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--sims", "-m", type=int, default=0)
    p.add_argument("--arena-games", type=int, default=0)
    p.add_argument("--channels", type=int, default=0)
    p.add_argument("--net-depth", type=int, default=0)
    p.add_argument("--checkpoint-dir", "-C", default="./pbt")
    p.add_argument("--variant", default="{}")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses
    from alphazero_tpu.config import Config, GameConfig
    from alphazero_tpu.train.population import PopulationTrainer

    cfg = Config(game=GameConfig(name=args.game,
                                 variant=json.loads(args.variant)),
                 checkpoint_dir=args.checkpoint_dir, seed=args.seed)
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train,
                                  games_per_iter=args.games_per_iter),
        selfplay=dataclasses.replace(cfg.selfplay, batch_size=args.batch))
    if args.sims:
        cfg = cfg.replace(mcts=dataclasses.replace(cfg.mcts,
                                                   num_sims=args.sims))
    if args.arena_games:
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, arena_games=args.arena_games))
    if args.channels or args.net_depth:
        cfg = cfg.replace(net=dataclasses.replace(
            cfg.net, channels=args.channels or cfg.net.channels,
            depth=args.net_depth or cfg.net.depth))

    time_lr = tuple(args.time_lr) if args.time_lr else None
    if args.scheduler == "asha":
        from alphazero_tpu.train.population import AshaTrainer
        trainer = AshaTrainer(cfg, num_samples=args.num_samples,
                              pop_size=args.population, grace=args.grace,
                              max_t=args.max_t, seed=args.seed,
                              time_lr=time_lr)
    else:
        trainer = PopulationTrainer(cfg, pop_size=args.population,
                                    seed=args.seed,
                                    exploit_interval=args.exploit_interval,
                                    time_lr=time_lr)
    os.makedirs(args.checkpoint_dir, exist_ok=True)
    hist_path = os.path.join(args.checkpoint_dir,
                             f"{args.scheduler}_history.jsonl")
    step = 0
    while True:
        if args.scheduler == "asha":
            if trainer.done:
                break
        elif step >= args.steps:
            break
        metrics = trainer.step()
        with open(hist_path, "a") as f:
            for m in metrics:
                f.write(json.dumps({"step": step, **{
                    k: v for k, v in m.items() if k != "selfplay"}},
                    default=str) + "\n")
        scores = {m.idx: round(m.score, 3) for m in trainer.members}
        print(f"step {step}: scores {scores}")
        step += 1
    best = trainer.best()
    best.coach.save("best")
    # the reference persists the winning score for the tuner (pit.py:77-84)
    with open(os.path.join(args.checkpoint_dir, "score.txt"), "w") as f:
        f.write(str(best.score))
    print(f"best member {best.idx}: score {best.score:.3f} hp {best.hp}")


if __name__ == "__main__":
    main()
