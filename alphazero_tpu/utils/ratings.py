"""Glicko-2 ratings for checkpoint evaluation.

The reference persists glicko2 ratings as JSON next to checkpoints and
updates them after pit round-robins (/root/reference/pit.py:136-165).  This
is a self-contained implementation of Glickman's Glicko-2 (public algorithm,
http://www.glicko.net/glicko/glicko2.pdf) with the same JSON persistence
idea.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import Dict, List, Sequence, Tuple

TAU = 0.5
EPS = 1e-6
GLICKO2_SCALE = 173.7178


@dataclasses.dataclass
class Rating:
    rating: float = 1500.0
    rd: float = 350.0
    vol: float = 0.06

    def to_dict(self):
        return dataclasses.asdict(self)


def _g(phi):
    return 1.0 / math.sqrt(1.0 + 3.0 * phi * phi / math.pi ** 2)


def _expect(mu, mu_j, phi_j):
    # clamped away from 0/1: at extreme rating gaps E*(1-E) underflows and
    # the variance inverse v_inv becomes 0 (division by zero on a clean
    # sweep, e.g. trained net 128-0 vs random)
    x = min(max(-_g(phi_j) * (mu - mu_j), -700.0), 700.0)
    e = 1.0 / (1.0 + math.exp(x))
    return min(max(e, 1e-12), 1.0 - 1e-12)


def update(player: Rating, opponents: Sequence[Rating],
           scores: Sequence[float]) -> Rating:
    """One rating period: scores in [0,1] (1 win, 0.5 draw, 0 loss)."""
    if not opponents:
        # RD grows with inactivity
        phi = player.rd / GLICKO2_SCALE
        phi = math.sqrt(phi * phi + player.vol ** 2)
        return Rating(player.rating, min(phi * GLICKO2_SCALE, 350.0),
                      player.vol)

    mu = (player.rating - 1500.0) / GLICKO2_SCALE
    phi = player.rd / GLICKO2_SCALE
    mus = [(o.rating - 1500.0) / GLICKO2_SCALE for o in opponents]
    phis = [o.rd / GLICKO2_SCALE for o in opponents]

    v_inv = sum(_g(pj) ** 2 * _expect(mu, mj, pj) * (1 - _expect(mu, mj, pj))
                for mj, pj in zip(mus, phis))
    v = 1.0 / v_inv
    delta = v * sum(_g(pj) * (s - _expect(mu, mj, pj))
                    for mj, pj, s in zip(mus, phis, scores))

    # volatility iteration (Illinois algorithm)
    a = math.log(player.vol ** 2)

    def f(x):
        ex = math.exp(x)
        num = ex * (delta ** 2 - phi ** 2 - v - ex)
        den = 2.0 * (phi ** 2 + v + ex) ** 2
        return num / den - (x - a) / TAU ** 2

    A = a
    if delta ** 2 > phi ** 2 + v:
        B = math.log(delta ** 2 - phi ** 2 - v)
    else:
        k = 1
        while f(a - k * TAU) < 0:
            k += 1
        B = a - k * TAU
    fa, fb = f(A), f(B)
    while abs(B - A) > EPS:
        C = A + (A - B) * fa / (fb - fa)
        fc = f(C)
        if fc * fb <= 0:
            A, fa = B, fb
        else:
            fa = fa / 2
        B, fb = C, fc
    new_vol = math.exp(A / 2)

    phi_star = math.sqrt(phi ** 2 + new_vol ** 2)
    new_phi = 1.0 / math.sqrt(1.0 / phi_star ** 2 + 1.0 / v)
    new_mu = mu + new_phi ** 2 * sum(
        _g(pj) * (s - _expect(mu, mj, pj))
        for mj, pj, s in zip(mus, phis, scores))
    # numeric guards: clean sweeps at extreme gaps make v explode, which can
    # blow up the volatility iteration and the mean step; one rating period
    # over any real game set cannot justify a jump past a few hundred points
    new_mu = min(max(new_mu, mu - 3.0), mu + 3.0)        # ±~520 rating pts
    new_vol = min(max(new_vol, 1e-4), 0.5)
    new_phi = min(max(new_phi, 10.0 / GLICKO2_SCALE), 350.0 / GLICKO2_SCALE)
    return Rating(new_mu * GLICKO2_SCALE + 1500.0,
                  new_phi * GLICKO2_SCALE, new_vol)


# --- JSON persistence (reference pit.py:136-165) ----------------------------

def load_ratings(path: str) -> Dict[str, Rating]:
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        d = json.load(f)
    return {k: Rating(**v) for k, v in d.items()}


def save_ratings(path: str, ratings: Dict[str, Rating]):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump({k: r.to_dict() for k, r in ratings.items()}, f, indent=2)


def update_pair(ratings: Dict[str, Rating], name_a: str, name_b: str,
                wins_a: int, wins_b: int, draws: int):
    """Update both players from one match series (one rating period each)."""
    ra = ratings.get(name_a, Rating())
    rb = ratings.get(name_b, Rating())
    scores_a: List[float] = ([1.0] * wins_a + [0.0] * wins_b
                             + [0.5] * draws)
    scores_b = [1.0 - s for s in scores_a]
    n = len(scores_a)
    ratings[name_a] = update(ra, [rb] * n, scores_a)
    ratings[name_b] = update(rb, [ra] * n, scores_b)
    return ratings
