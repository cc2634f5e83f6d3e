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
    p = argparse.ArgumentParser(description="alphazero_tpu PBT")
    p.add_argument("game", nargs="?", default="santorini")
    p.add_argument("--population", "-k", type=int, default=4)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--exploit-interval", type=int, default=2)
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

    trainer = PopulationTrainer(cfg, pop_size=args.population,
                                seed=args.seed,
                                exploit_interval=args.exploit_interval)
    os.makedirs(args.checkpoint_dir, exist_ok=True)
    hist_path = os.path.join(args.checkpoint_dir, "pbt_history.jsonl")
    for step in range(args.steps):
        metrics = trainer.step()
        with open(hist_path, "a") as f:
            for m in metrics:
                f.write(json.dumps({"step": step, **{
                    k: v for k, v in m.items() if k != "selfplay"}},
                    default=str) + "\n")
        scores = {m.idx: round(m.score, 3) for m in trainer.members}
        print(f"step {step}: scores {scores}")
    best = trainer.best()
    best.coach.save("best")
    # the reference persists the winning score for the tuner (pit.py:77-84)
    with open(os.path.join(args.checkpoint_dir, "score.txt"), "w") as f:
        f.write(str(best.score))
    print(f"best member {best.idx}: score {best.score:.3f} hp {best.hp}")


if __name__ == "__main__":
    main()
