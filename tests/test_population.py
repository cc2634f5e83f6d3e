"""PBT population trainer (the Ray Tune replacement, SURVEY.md §2.5 item 3)."""

import dataclasses

import pytest

from alphazero_tpu.config import Config, GameConfig
from alphazero_tpu.train.population import (DEFAULT_SPACE, PopulationTrainer,
                                            _apply_hp, _perturb, _sample)
import random


def tiny_cfg():
    cfg = Config(game=GameConfig(name="santorini",
                                 variant=dict(nb_gods=1, init_method=1)))
    cfg = cfg.replace(
        mcts=dataclasses.replace(cfg.mcts, num_sims=4, ratio_full=4,
                                 max_depth=4),
        selfplay=dataclasses.replace(cfg.selfplay, batch_size=4),
        train=dataclasses.replace(cfg.train, games_per_iter=2, epochs=1,
                                  batch_size=16, arena_games=2),
        net=dataclasses.replace(cfg.net, channels=8, depth=1),
    )
    return cfg


def test_space_sampling_and_perturbation():
    rng = random.Random(0)
    hp = _sample(DEFAULT_SPACE, rng)
    for k, (lo, hi, _) in DEFAULT_SPACE.items():
        assert lo <= hp[k] <= hi
    hp2 = _perturb(hp, DEFAULT_SPACE, rng)
    for k, (lo, hi, _) in DEFAULT_SPACE.items():
        assert lo <= hp2[k] <= hi


def test_apply_hp_types():
    cfg = tiny_cfg()
    cfg2 = _apply_hp(cfg, {"mcts.cpuct": 2.5, "train.learn_rate": 1e-3})
    assert cfg2.mcts.cpuct == 2.5
    assert cfg2.train.learn_rate == 1e-3
    assert cfg2.mcts.num_sims == 4          # untouched fields preserved


def test_population_steps_and_exploit():
    trainer = PopulationTrainer(tiny_cfg(), pop_size=2, seed=1,
                                exploit_interval=1)
    out = trainer.run(2)
    assert len(out) == 2 and len(out[0]) == 2
    for m in trainer.members:
        assert 0.0 <= m.score <= 1.0
        assert m.steps == 2
    assert trainer.best().score >= min(m.score for m in trainer.members)
