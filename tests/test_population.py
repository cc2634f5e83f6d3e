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


def test_time_interpolated_lr():
    from alphazero_tpu.train.population import compute_time_lr
    t0 = 1_000_000.0
    # log-interpolation endpoints + midpoint (reference rayConfig.py:13-24)
    assert abs(compute_time_lr(3e-4, 1e-5, t0, 72, now=t0) - 3e-4) < 1e-9
    assert abs(compute_time_lr(3e-4, 1e-5, t0, 72, now=t0 + 72 * 3600)
               - 1e-5) < 1e-9
    import math
    mid = compute_time_lr(3e-4, 1e-5, t0, 72, now=t0 + 36 * 3600)
    assert abs(math.log10(mid) - (math.log10(3e-4) + math.log10(1e-5)) / 2) \
        < 1e-9
    # clamped outside the window (10**log10 round-trip is approximate)
    assert abs(compute_time_lr(3e-4, 1e-5, t0, 72, now=t0 - 10) - 3e-4) < 1e-9


def test_asha_rungs_and_replacement():
    """ASHA must cut below-quantile members at rungs and resample until
    num_samples configurations have been tried."""
    from alphazero_tpu.train.population import AshaTrainer
    trainer = AshaTrainer(tiny_cfg(), num_samples=4, pop_size=2, grace=1,
                          max_t=2, eta=2, seed=1)
    steps = 0
    while not trainer.done and steps < 12:
        trainer.step()
        steps += 1
    assert trainer.done
    assert trainer.sampled == 4
    assert len(trainer.finished) == 4
    best = trainer.best()
    assert 0.0 <= best.score <= 1.0
    # every finished member stopped at a rung or ran to max_t
    assert all(m.steps in (1, 2) for m in trainer.finished)
