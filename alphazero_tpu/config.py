"""Single config tree for the whole framework.

Replaces the reference's ~30 argparse flags (/root/reference/main.py:120-157)
plus per-game module constants with one serializable dataclass tree; the full
config is embedded into every checkpoint like the reference's
``additional_keys`` mechanism (/root/reference/GenericNNetWrapper.py:192-205).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional, Tuple

# The reference's per-universe "magic seeds" for pseudo-deterministic chance
# during search (/root/reference/MCTS.py:14).
MAGIC_SEEDS = (31416, 1, 14142, 42, 27183, 2, 16180, 7)


@dataclasses.dataclass(frozen=True)
class MCTSConfig:
    """Search hyperparameters (defaults = reference main.py:127-147)."""
    num_sims: int = 100            # full-search sims (--numMCTSSims)
    cpuct: float = 1.25
    fpu: float = 0.0               # >0: parent-relative Qs-fpu, <=0: absolute
    dirichlet_alpha: float = -1.0  # >0 fixed, <0 auto 10/n_valid, 0 disabled
    temp_soft: float = 1.1         # softmax temp on root prior (--temperature[2])
    forced_playouts: bool = False
    ratio_full: int = 5            # fast search sims = num_sims // ratio_full
    prob_full: float = 0.25        # playout-cap randomization
    universes: int = 1             # 0 => true-random chance during search
    max_depth: int = 0             # >0: cap descent depth (perf knob; capped
    #                                revisits back up the node's stored Q)
    descent_unroll: int = 1        # tree levels per descent-loop iteration
    #                                (>1 amortizes TPU loop-control sync at
    #                                the cost of masked wasted levels;
    #                                measured neutral on the TPU bench)
    dyn_sims: bool = False         # run the sim loop as a lax.while_loop
    #                                with a data-dependent bound (max live
    #                                budget): the backend cannot unroll it,
    #                                so the compiled program holds ONE sim
    #                                body regardless of num_sims — the
    #                                scan-fault escape hatch
    #                                (docs/tpu_limits.md).  Bit-exact with
    #                                the scan path; forces a full-width
    #                                arena (no staging savings)
    dyn_stages: int = 1            # >1: run the dyn_sims while_loop in k
    #                                width stages over growing arenas (same
    #                                plan as arena_stages, same bit-exact
    #                                padding) — recovers the staging savings
    #                                dyn_sims otherwise forfeits (per-sim
    #                                pass cost scales with arena width).
    #                                Default 1 = the round-4 single
    #                                full-width loop; k>1 compiles k loop
    #                                bodies (k tunnel compiles, cached)
    arena_stages: int = 4          # run the sim scan in k stages over growing
    #                                node arenas (sim s only needs s+1 nodes,
    #                                and per-sim pass cost scales with arena
    #                                width); pure padding between stages —
    #                                bit-exact.  1 = single full-width scan;
    #                                ignored when a reused subtree seeds the
    #                                arena (its width is dynamic per lane)
    # array dtypes for the tree storage (memory/perf knobs)
    q_dtype: str = "float32"
    prior_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class SelfPlayConfig:
    batch_size: int = 256          # parallel games per self-play scan
    temp_begin: float = 1.0        # --temperature[0]
    temp_end: float = 0.1          # --temperature[1]
    temp_half_life: int = 10       # --tempThreshold (<0 => step schedule)
    scan_moves: int = 0            # moves per self-play scan (0 = the game's
    #                                max length; smaller trades some wasted
    #                                unfinished-episode slots for a smaller
    #                                compiled program)
    dyn: bool = False              # data-dependent move loop
    #                                (run_selfplay_dyn): while_loop the
    #                                backend cannot unroll + ON-DEVICE quota
    #                                early-exit — one program per iteration,
    #                                no chunking, no per-chunk host trips;
    #                                bit-exact with the scan path
    pcr_split: bool = True         # True: full/fast PCR lanes run two
    #                                right-sized searches (less compute);
    #                                False: ONE merged search with per-lane
    #                                budgets — halves the compiled per-move
    #                                body, for engines near the TPU
    #                                program-size fault (docs/tpu_limits.md)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # reference recipe anneals 3e-3 -> 3e-4 over stages (README.md:157-163);
    # 3e-4 alone leaves the value head unfit (measured corr(v,z) ~ 0).
    # lr 2e-3 / epochs 4 / arena 30 is the measured working recipe on
    # Santorini no-gods (ratchets 9 accepts / 14 iters from scratch)
    learn_rate: float = 2e-3
    # cross-iteration peak-LR annealing: when lr_anneal_iters > 0, the
    # OneCycle peak for iteration i log-interpolates learn_rate -> lr_final
    # over that many iterations (the reference's staged recipe anneals
    # 3e-3 -> 3e-4 across training, /root/reference/README.md:157-163);
    # 0 = the reference's literal per-call behavior (every train() restarts
    # OneCycle at the same peak)
    lr_anneal_iters: int = 0
    lr_final: float = 2e-4
    epochs: int = 4
    batch_size: int = 512
    q_weight: float = 0.5          # value target = (Z + w*Q)/(1+w)
    value_loss_weight: float = 0.25
    replay_capacity: int = 500_000
    num_iters: int = 50
    num_iters_history: int = 0     # --numItersHistory; >0 trains only on
    #                                the newest N iterations' examples
    #                                (reference drop-oldest history,
    #                                Coach.py:106,186-189); 0 = whole ring
    games_per_iter: int = 2048     # --numEps analog (games per iteration)
    # gate operating point: the reference's 30 games @ 0.60 was a CPU-cost
    # compromise (main.py:159) with ~±9% binomial noise; on TPU gate games
    # cost ~60 ms each, so run 300 @ 0.55 — the same effective accept bar
    # with ~±3% CI (0.60 at n=30 and 0.55 at n=300 have comparable
    # one-sided accept probability for a truly-equal candidate)
    update_threshold: float = 0.55
    arena_games: int = 300
    stop_after_n_fail: int = 25
    symmetry_augment: bool = True  # random symmetry per training sample
    # fraction denominator for the held-out lane split: self-play lanes with
    # lane_id % holdout_lane_mod == 0 feed the validation buffer instead of
    # the training ring (whole episodes, never trainable).  0 disables.
    holdout_lane_mod: int = 50


@dataclasses.dataclass(frozen=True)
class NetConfig:
    version: int = 1
    channels: int = 128
    depth: int = 6
    dtype: str = "bfloat16"        # compute dtype (params stay float32)


@dataclasses.dataclass(frozen=True)
class GameConfig:
    name: str = "santorini"
    variant: Dict[str, Any] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data_axis: int = -1            # -1 => all remaining devices
    model_axis: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    game: GameConfig = dataclasses.field(default_factory=GameConfig)
    mcts: MCTSConfig = dataclasses.field(default_factory=MCTSConfig)
    selfplay: SelfPlayConfig = dataclasses.field(default_factory=SelfPlayConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    net: NetConfig = dataclasses.field(default_factory=NetConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    seed: int = 0
    checkpoint_dir: str = "./checkpoints"

    # ---- (de)serialization — embedded in checkpoints -----------------------

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        return cls(
            game=GameConfig(**d.get("game", {})),
            mcts=MCTSConfig(**d.get("mcts", {})),
            selfplay=SelfPlayConfig(**d.get("selfplay", {})),
            train=TrainConfig(**d.get("train", {})),
            net=NetConfig(**d.get("net", {})),
            mesh=MeshConfig(**d.get("mesh", {})),
            seed=d.get("seed", 0),
            checkpoint_dir=d.get("checkpoint_dir", "./checkpoints"),
        )

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return cls.from_dict(json.loads(s))

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def diff_configs(old: Dict[str, Any], new: Dict[str, Any], prefix: str = ""):
    """Flat diff of two config dicts — the reference's compare_settings
    (/root/reference/main.py:64-83) as a library function."""
    diffs = []
    keys = sorted(set(old) | set(new))
    for k in keys:
        ov, nv = old.get(k, "<missing>"), new.get(k, "<missing>")
        if isinstance(ov, dict) and isinstance(nv, dict):
            diffs += diff_configs(ov, nv, prefix=f"{prefix}{k}.")
        elif ov != nv:
            diffs.append((f"{prefix}{k}", ov, nv))
    return diffs
