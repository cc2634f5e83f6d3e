"""Crash-durability resume: a fresh Coach restores iteration counter,
rejected-gate count, and the replay buffer from a run directory's
loop_state.json / replay.npz / temp checkpoint (the reference persists its
example history every iteration and reloads on -L, Coach.py:167-262)."""

import pytest

from alphazero_tpu.config import (Config, GameConfig, MCTSConfig, NetConfig,
                                  SelfPlayConfig, TrainConfig)
from alphazero_tpu.train.coach import Coach


def tiny_cfg(ckpt_dir):
    return Config(
        game=GameConfig(name="santorini",
                        variant=dict(nb_gods=1, init_method=1)),
        mcts=MCTSConfig(num_sims=8, ratio_full=4),
        selfplay=SelfPlayConfig(batch_size=8),
        train=TrainConfig(batch_size=16, epochs=1, games_per_iter=2,
                          arena_games=4, replay_capacity=4096, num_iters=2),
        net=NetConfig(version=1, channels=16, depth=1),
        checkpoint_dir=str(ckpt_dir))


@pytest.mark.slow
def test_coach_crash_resume(tmp_path):
    cfg = tiny_cfg(tmp_path)
    c1 = Coach(cfg)
    c1.run_iteration()
    c1.run_iteration()
    it, fails = c1.iteration, c1.consecutive_failures
    rsize = c1.replay.size
    assert it == 2 and rsize > 0

    # simulate a crash: brand-new Coach restores from the run dir alone
    c2 = Coach(cfg)
    c2.load(str(tmp_path / "temp"))
    assert c2.iteration == it
    assert c2.consecutive_failures == fails
    assert c2.replay.size == rsize

    m = c2.run_iteration()
    assert m["iteration"] == it + 1
