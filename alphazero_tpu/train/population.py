"""Population-Based Training — the TPU-native replacement for the
reference's Ray Tune layer (/root/reference/useRay.py:14-82 +
rayConfig.py:26-106).

The reference runs 6 concurrent OS-process trials, each step being a
``subprocess.run(main.py ...)`` followed by ``subprocess.run(pit.py ...)``
with the score read back from ``score.txt`` on disk.  Here the population
lives in ONE process on the accelerator: members share the compiled
self-play/train/arena programs (identical shapes => one compilation), scores
come from on-device round-robin arenas, and exploit/explore copies live
parameter pytrees instead of checkpoint directories.

Search space + mutation semantics follow rayConfig.gen_params (:72-106) and
Ray's PBT defaults: on exploit, the loser clones the winner's params and
perturbs each hyperparameter by x1.2 / x0.8 (or resamples with prob 0.25).
"""

from __future__ import annotations

import dataclasses
import logging
import math
import random
import time
from typing import Dict, List, Optional, Tuple

log = logging.getLogger(__name__)


def compute_time_lr(start_lr: float, end_lr: float, start_time: float,
                    total_hours: float, now: Optional[float] = None) -> float:
    """Wall-clock log-interpolated learning rate — the reference's
    compute_lr over a 72 h experiment (/root/reference/rayConfig.py:13-24)."""
    now = time.time() if now is None else now
    span = max(total_hours * 3600.0, 1e-9)
    progress = min(max((now - start_time) / span, 0.0), 1.0)
    return 10.0 ** (math.log10(start_lr)
                    + progress * (math.log10(end_lr) - math.log10(start_lr)))

# search space: dotted config path -> (low, high, log-scale)
# (reference rayConfig.py:72-106: cpuct, fpu, q_weight, universes, lr, ...)
DEFAULT_SPACE: Dict[str, Tuple[float, float, bool]] = {
    "mcts.cpuct": (0.5, 4.0, True),
    "mcts.fpu": (0.0, 0.4, False),
    "train.learn_rate": (3e-4, 3e-2, True),
    "train.q_weight": (0.0, 1.0, False),
    "mcts.temp_soft": (1.0, 1.5, False),
}


def _sample(space, rng) -> Dict[str, float]:
    out = {}
    for k, (lo, hi, is_log) in space.items():
        if is_log:
            out[k] = math.exp(rng.uniform(math.log(max(lo, 1e-9)),
                                          math.log(hi)))
        else:
            out[k] = rng.uniform(lo, hi)
    return out


def _perturb(hp, space, rng) -> Dict[str, float]:
    out = {}
    for k, v in hp.items():
        lo, hi, is_log = space[k]
        if rng.random() < 0.25:
            out[k] = _sample({k: space[k]}, rng)[k]
        else:
            out[k] = min(hi, max(lo, v * rng.choice([0.8, 1.2])))
    return out


def _apply_hp(cfg, hp):
    """Apply dotted-path hyperparameters onto a Config tree."""
    sections: Dict[str, Dict[str, float]] = {}
    for k, v in hp.items():
        sec, field = k.split(".", 1)
        sections.setdefault(sec, {})[field] = v
    repl = {}
    for sec, fields in sections.items():
        # int-typed fields round
        sub = getattr(cfg, sec)
        cast = {f: (int(round(v)) if isinstance(getattr(sub, f), int)
                    and not isinstance(getattr(sub, f), bool) else v)
                for f, v in fields.items()}
        repl[sec] = dataclasses.replace(sub, **cast)
    return cfg.replace(**repl)


@dataclasses.dataclass
class Member:
    idx: int
    hp: Dict[str, float]
    coach: object
    score: float = 0.5       # running winrate vs the pool
    steps: int = 0


class PopulationTrainer:
    """K trials of the full self-play->train->gate loop with PBT
    exploit/explore (reference PBT scheduler, useRay.py:14-31)."""

    def __init__(self, base_cfg, *, pop_size: int = 4,
                 space: Optional[Dict] = None, seed: int = 0,
                 exploit_interval: int = 2, quantile: float = 0.25,
                 time_lr: Optional[Tuple[float, float, float]] = None):
        """time_lr = (start_lr, end_lr, hours): wall-clock log-interpolated
        learning rate applied to every member each step (the reference drops
        lr from the mutation space when using it, rayConfig.py:37-38)."""
        from alphazero_tpu.train.coach import Coach
        self.space = dict(space or DEFAULT_SPACE)
        self.time_lr = time_lr
        if time_lr is not None:
            self.space.pop("train.learn_rate", None)
        self.rng = random.Random(seed)
        self.exploit_interval = exploit_interval
        self.quantile = quantile
        self.t0 = time.time()
        self.members: List[Member] = []
        for i in range(pop_size):
            hp = _sample(self.space, self.rng)
            cfg = _apply_hp(base_cfg, hp).replace(seed=seed * 1000 + i)
            self.members.append(Member(idx=i, hp=hp, coach=Coach(cfg)))
        self.step_count = 0

    # ------------------------------------------------------------------

    def _pairwise_scores(self, key_seed: int):
        """Ring round-robin: each member plays its neighbor both ways; score
        = pooled winrate (the reference scores each trial by a pit arena vs
        a comparison pool, rayConfig.py:40-54)."""
        import jax
        from alphazero_tpu.train.arena import play_matches

        K = len(self.members)
        wins = [0.0] * K
        games = [0.0] * K
        cfg = self.members[0].coach.cfg
        for i in range(K):
            j = (i + 1) % K
            a, b = self.members[i], self.members[j]
            res = play_matches(
                a.coach.spec, a.coach.net, a.coach.state.params,
                b.coach.state.params, jax.random.PRNGKey(key_seed * K + i),
                cfg=cfg.mcts, num_games=cfg.train.arena_games)
            one, two, dr = float(res.one_wins), float(res.two_wins), \
                float(res.draws)
            wins[i] += one + 0.5 * dr
            wins[j] += two + 0.5 * dr
            games[i] += one + two + dr
            games[j] += one + two + dr
        for m in self.members:
            m.score = wins[m.idx] / max(games[m.idx], 1.0)

    def _exploit_explore(self):
        ranked = sorted(self.members, key=lambda m: m.score, reverse=True)
        n_cut = max(1, int(len(ranked) * self.quantile))
        tops, bottoms = ranked[:n_cut], ranked[-n_cut:]
        for loser in bottoms:
            winner = self.rng.choice(tops)
            if winner is loser:
                continue
            log.info("PBT: member %d (%.2f) <- member %d (%.2f)",
                     loser.idx, loser.score, winner.idx, winner.score)
            loser.coach.state = loser.coach.state.replace(
                params=winner.coach.state.params)
            loser.coach.prev_params = winner.coach.prev_params
            loser.hp = _perturb(winner.hp, self.space, self.rng)
            loser.coach.cfg = _apply_hp(loser.coach.cfg, loser.hp)

    # ------------------------------------------------------------------

    def step(self) -> List[dict]:
        """One PBT step: every member runs one full coach iteration; on
        interval boundaries, score the pool and exploit/explore."""
        self.step_count += 1
        if self.time_lr is not None:
            lr = compute_time_lr(self.time_lr[0], self.time_lr[1], self.t0,
                                 self.time_lr[2])
            for m in self.members:
                m.coach.cfg = _apply_hp(m.coach.cfg,
                                        {"train.learn_rate": lr})
        metrics = []
        for m in self.members:
            r = m.coach.run_iteration()
            m.steps += 1
            metrics.append(dict(member=m.idx, hp=dict(m.hp), **r))
        if self.step_count % self.exploit_interval == 0:
            self._pairwise_scores(self.step_count)
            self._exploit_explore()
        return metrics

    def run(self, num_steps: int) -> List[List[dict]]:
        return [self.step() for _ in range(num_steps)]

    def best(self) -> Member:
        return max(self.members, key=lambda m: m.score)


class AshaTrainer:
    """Asynchronous Successive Halving (ASHA) — the reference's third Ray
    scheduler (/root/reference/useRay.py:42-49: ASHAScheduler(grace_period=1,
    max_t=4), num_samples=50).

    `pop_size` members train concurrently (the in-process analog of Ray's
    trial concurrency); each is a fresh hyperparameter sample.  When a member
    reaches a rung (grace * eta^k iterations) its score — arena winrate
    against a FIXED comparison opponent, mirroring the reference's pit vs
    comp_dir/best.pt (rayConfig.py:47-52) — is recorded; members below the
    top-1/eta quantile of their rung are stopped and replaced by new samples
    until `num_samples` configurations have been tried.

    The reference's PB2 scheduler (Bayesian-optimized PBT) is intentionally
    NOT reproduced: it requires a GP model over trial history; PBT with
    bounded multiplicative perturbation covers the same exploit/explore role
    in-process.  Documented design decision per SURVEY §2.5.
    """

    def __init__(self, base_cfg, *, num_samples: int = 16, pop_size: int = 4,
                 grace: int = 1, max_t: int = 4, eta: int = 2,
                 space: Optional[Dict] = None, seed: int = 0,
                 comparison_params=None,
                 time_lr: Optional[Tuple[float, float, float]] = None):
        from alphazero_tpu.train.coach import Coach
        self._Coach = Coach
        self.base_cfg = base_cfg
        self.space = dict(space or DEFAULT_SPACE)
        self.time_lr = time_lr
        if time_lr is not None:
            self.space.pop("train.learn_rate", None)
        self.rng = random.Random(seed)
        self.seed = seed
        self.eta = eta
        self.max_t = max_t
        self.rungs = []
        r = grace
        while r < max_t:
            self.rungs.append(r)
            r *= eta
        self.rung_scores: Dict[int, List[float]] = {r: [] for r in self.rungs}
        self.num_samples = num_samples
        self.sampled = 0
        self.finished: List[Member] = []
        self.members: List[Member] = []
        for _ in range(min(pop_size, num_samples)):
            self.members.append(self._new_member())
        # fixed comparison opponent (fresh net unless given)
        if comparison_params is None:
            import jax
            from alphazero_tpu.models import init_params, make_net
            c0 = self.members[0].coach
            comparison_params = init_params(
                c0.net, c0.spec, jax.random.PRNGKey(seed + 999))
        self.comparison_params = comparison_params
        self.t0 = time.time()

    def _new_member(self) -> Member:
        hp = _sample(self.space, self.rng)
        cfg = _apply_hp(self.base_cfg, hp).replace(
            seed=self.seed * 1000 + self.sampled)
        m = Member(idx=self.sampled, hp=hp, coach=self._Coach(cfg))
        self.sampled += 1
        return m

    def _score(self, m: Member) -> float:
        import jax
        from alphazero_tpu.train.arena import play_matches
        cfg = m.coach.cfg
        res = play_matches(m.coach.spec, m.coach.net, m.coach.state.params,
                           self.comparison_params,
                           jax.random.PRNGKey(self.seed + 31 * m.idx),
                           cfg=cfg.mcts, num_games=cfg.train.arena_games)
        one, two, dr = (float(res.one_wins), float(res.two_wins),
                        float(res.draws))
        return (one + 0.5 * dr) / max(one + two + dr, 1.0)

    def step(self) -> List[dict]:
        """Advance every live member one iteration; apply rung cuts."""
        if self.time_lr is not None:
            lr = compute_time_lr(self.time_lr[0], self.time_lr[1], self.t0,
                                 self.time_lr[2])
            for m in self.members:
                m.coach.cfg = _apply_hp(m.coach.cfg,
                                        {"train.learn_rate": lr})
        metrics = []
        survivors = []
        for m in self.members:
            r = m.coach.run_iteration()
            m.steps += 1
            stopped = False
            if m.steps in self.rungs:
                m.score = self._score(m)
                scores = self.rung_scores[m.steps]
                scores.append(m.score)
                k = max(1, len(scores) // self.eta)
                cutoff = sorted(scores, reverse=True)[k - 1]
                if m.score < cutoff:
                    log.info("ASHA: stop member %d at rung %d "
                             "(score %.2f < cutoff %.2f)",
                             m.idx, m.steps, m.score, cutoff)
                    self.finished.append(m)
                    stopped = True
            if m.steps >= self.max_t and not stopped:
                m.score = self._score(m)
                self.finished.append(m)
                stopped = True
            metrics.append(dict(member=m.idx, hp=dict(m.hp),
                                stopped=stopped, rung=m.steps, **r))
            if not stopped:
                survivors.append(m)
            elif self.sampled < self.num_samples:
                survivors.append(self._new_member())
        self.members = survivors
        return metrics

    @property
    def done(self) -> bool:
        return not self.members

    def run(self) -> Member:
        while not self.done:
            self.step()
        return self.best()

    def best(self) -> Member:
        pool = self.finished + self.members
        return max(pool, key=lambda m: m.score)
