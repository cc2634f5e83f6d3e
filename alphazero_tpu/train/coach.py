"""Coach: the self-play -> train -> gate iteration loop.

Reference: /root/reference/Coach.py:150-215 (learn), with the TPU-native
substitutions from SURVEY.md §7: vectorized self-play scans instead of
thread-per-episode, a device train_step loop instead of torch CPU epochs, a
vmapped arena instead of serial games.  Gating semantics preserved: accept at
winrate >= update_threshold, rollback to the pre-train params on reject, stop
after N consecutive rejects (Coach.py:200-215).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from alphazero_tpu.config import Config
from alphazero_tpu.games import make_game
from alphazero_tpu.models import init_params, make_net, param_count
from alphazero_tpu.selfplay.actor import run_selfplay
from alphazero_tpu.selfplay.replay import ReplayBuffer
from alphazero_tpu.train.arena import play_matches_auto
from alphazero_tpu.train.checkpoint import (checkpoint_name, load_checkpoint,
                                            save_checkpoint)
from alphazero_tpu.train.learner import (TrainState, init_train_state,
                                         train_step)

log = logging.getLogger(__name__)


class Coach:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.spec = make_game(cfg.game.name, **cfg.game.variant)
        self.net = make_net(self.spec, cfg.net)
        self.key = jax.random.PRNGKey(cfg.seed)
        self.np_rng = np.random.default_rng(cfg.seed)

        from alphazero_tpu.selfplay.codec import pi_budget
        self.replay = ReplayBuffer(cfg.train.replay_capacity,
                                   self.spec.state_shape,
                                   self.spec.num_actions,
                                   self.spec.num_players,
                                   pi_budget=pi_budget(self.spec.num_actions,
                                                       cfg.mcts.num_sims),
                                   holdout_lane_mod=cfg.train.holdout_lane_mod)
        self.key, k = jax.random.split(self.key)
        params = init_params(self.net, self.spec, k)
        # per-iteration training-ring add counts: backs the reference's
        # drop-oldest example history (numItersHistory, Coach.py:106,186-189)
        # as a sampling window over the newest rows
        self.iter_adds: list[int] = []
        steps_per_iter = self._train_steps_per_iter()
        self.state = init_train_state(params, cfg.train, steps_per_iter)
        self.prev_params = params  # competitor (reference pnet, Coach.py:29)
        # mesh when several devices are visible: self-play lanes and train
        # batches shard over 'data'; large kernels optionally shard over
        # 'model' (cfg.mesh.model_axis > 1 — tensor parallelism); GSPMD
        # inserts the gradient all-reduce / kernel collectives over ICI
        # (SURVEY.md §2.5 scale-out)
        devs = jax.devices()
        n_dev = len(devs)
        num_model = max(1, cfg.mesh.model_axis)
        n_data = n_dev // num_model
        if (n_data > 1 and n_dev % num_model == 0
                and cfg.selfplay.batch_size % n_data == 0
                and cfg.train.batch_size % n_data == 0):
            from alphazero_tpu.parallel.mesh import make_mesh, shard_params
            self.mesh = make_mesh(num_data=n_data, num_model=num_model,
                                  devices=devs)
            log.info("mesh over %d devices: data=%d model=%d",
                     n_dev, n_data, num_model)
            if num_model > 1:
                self.state = self.state.replace(params=shard_params(
                    self.state.params, self.mesh, model_parallel=True))
                self.prev_params = self.state.params
            else:
                from alphazero_tpu.parallel.mesh import (host_to_global,
                                                         spans_processes)
                if spans_processes(self.mesh):
                    # multi-host: params must live on the GLOBAL mesh before
                    # they meet global batches inside jit; every process
                    # initialized identical params from the same seed
                    gp = host_to_global(jax.device_get(self.state.params),
                                        self.mesh)
                    self.state = init_train_state(gp, cfg.train,
                                                  steps_per_iter)
                    self.prev_params = gp
        else:
            self.mesh = None
        self.iteration = 0
        self.consecutive_failures = 0
        self.skip_first_selfplay = False
        self.history = []  # per-iteration metric dicts
        # JSONL metrics stream (SURVEY.md §5 observability)
        from alphazero_tpu.utils.profiling import MetricsLogger
        self.metrics_log = MetricsLogger(
            os.path.join(cfg.checkpoint_dir, "metrics.jsonl")) \
            if cfg.checkpoint_dir and jax.process_index() == 0 else None
        log.info("game=%s actions=%d params=%d", self.spec.name,
                 self.spec.num_actions, param_count(params))

    # ------------------------------------------------------------------

    def _history_window(self) -> int | None:
        """Sampling window in rows = examples added by the newest
        numItersHistory iterations (reference drop-oldest example history,
        Coach.py:106,186-189); None = whole ring (history disabled)."""
        h = self.cfg.train.num_iters_history
        if h <= 0 or not self.iter_adds:
            return None
        return max(1, sum(self.iter_adds[-h:]))

    def _train_steps_per_iter(self) -> int:
        """epochs passes over the kept example history (the reference samples
        epochs * len(examples)/batch_size batches, GenericNNetWrapper.py:53).
        Before any self-play, fall back to the expected first-iteration size."""
        t = self.cfg.train
        n = self.replay.size if self.replay.size > 0 \
            else min(t.replay_capacity, t.games_per_iter * 40)
        w = self._history_window()
        if w is not None:
            n = min(n, w)
        return t.epochs * max(1, n // t.batch_size)

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        # multi-host: the key enters jit alongside global arrays, so it must
        # be a (replicated) global array itself; every process derives the
        # same key from the same seed
        from alphazero_tpu.parallel.mesh import host_to_global
        return host_to_global(k, self.mesh)

    # ------------------------------------------------------------------

    def self_play(self) -> dict:
        """Run vectorized self-play scans until the game quota is met."""
        cfg = self.cfg
        B = cfg.selfplay.batch_size
        num_moves = self.spec.max_game_length
        chunk = cfg.selfplay.scan_moves
        if (not chunk and self.spec.safe_scan_moves
                and self.spec.safe_scan_moves < num_moves
                and jax.default_backend() not in ("cpu",)):
            # engines with a measured TPU long-scan fault threshold
            # (docs/tpu_limits.md) auto-chunk instead of crashing the worker
            chunk = self.spec.safe_scan_moves
            if (self.spec.safe_scan_sims
                    and cfg.mcts.num_sims > self.spec.safe_scan_sims):
                # the fault threshold shrinks with program size: a chunk
                # measured safe at safe_scan_sims is NOT safe beyond it
                # (splendor: 8 moves ok at sims=100, faults at sims=200
                # where only 1-move programs pass — docs/tpu_limits.md)
                chunk = 1
            if self.iteration <= 1:
                log.info("auto-chunking self-play scans to %d moves "
                         "(TPU long-scan fault threshold for %s at "
                         "num_sims=%d, docs/tpu_limits.md)", chunk,
                         self.spec.name, cfg.mcts.num_sims)
        episodes = 0
        examples = 0
        sims = 0
        t0 = time.time()
        while episodes < cfg.train.games_per_iter:
            if cfg.selfplay.dyn:
                # dynamic path: ONE small program (while_loop move body the
                # backend cannot unroll) with the quota exit on device —
                # supersedes chunking for scan-fault engines
                from alphazero_tpu.parallel.mesh import fetch_replicated
                from alphazero_tpu.selfplay.actor import run_selfplay_dyn
                from alphazero_tpu.selfplay.codec import encode_examples
                batch, stats = run_selfplay_dyn(
                    self.spec, self.net, self.state.params, self._next_key(),
                    cfg.train.games_per_iter - episodes,
                    mc=cfg.mcts, sp=cfg.selfplay, num_moves=num_moves,
                    batch_size=B, mesh=self.mesh)
                n_full = min(B, max(1, round(B * cfg.mcts.prob_full)))
                enc = encode_examples(batch, num_rows=num_moves * n_full,
                                      k_pi=self.replay.k_pi)
                examples += self.replay.add_encoded(
                    fetch_replicated(enc, self.mesh))
                episodes += int(stats.episodes_done)
                sims += int(stats.sims)
            elif chunk and chunk < num_moves:
                # chunked path (long-scan TPU fault workaround) — same codec
                # + mesh treatment as the fast path: encode on device per
                # chunk, transfer only encoded rows
                from alphazero_tpu.selfplay.actor import run_selfplay_chunked
                encs, stats = run_selfplay_chunked(
                    self.spec, self.net, self.state.params, self._next_key(),
                    mc=cfg.mcts, sp=cfg.selfplay, num_moves=num_moves,
                    chunk_moves=chunk, batch_size=B, mesh=self.mesh,
                    k_pi=self.replay.k_pi,
                    stop_after_episodes=cfg.train.games_per_iter - episodes)
                for enc in encs:
                    examples += self.replay.add_encoded(enc)
                episodes += int(stats.episodes_done)
                sims += int(stats.sims)
            else:
                batch, stats = run_selfplay(
                    self.spec, self.net, self.state.params, self._next_key(),
                    mc=cfg.mcts, sp=cfg.selfplay, num_moves=num_moves,
                    batch_size=B, mesh=self.mesh)
                # compress ON DEVICE before the device->host hop: only
                # full-search lanes can carry examples, pi rows are
                # num_sims-sparse, valids bit-pack (selfplay/codec.py) —
                # for wide action spaces this cuts the transfer ~40x
                # (dense akropolis batches measured 8 min/iter through
                # the tunnel)
                from alphazero_tpu.parallel.mesh import fetch_replicated
                from alphazero_tpu.selfplay.codec import encode_examples
                n_full = min(B, max(1, round(B * cfg.mcts.prob_full)))
                enc = encode_examples(batch, num_rows=num_moves * n_full,
                                      k_pi=self.replay.k_pi)
                # multi-host: the encoded rows are all-gathered so every
                # process inserts the SAME rows — host replay state stays
                # replicated by construction (same seeds, same data)
                examples += self.replay.add_encoded(
                    fetch_replicated(enc, self.mesh))
                episodes += int(stats.episodes_done)
                sims += int(stats.sims)
        dt = time.time() - t0
        self.iter_adds.append(int(examples))
        if self.replay.size == self.replay.capacity:
            # reference warns when the example deque saturates
            # (Coach.py:111-112,163-164)
            log.warning("replay buffer saturated at %d examples — oldest "
                        "iterations are being overwritten", self.replay.size)
        return dict(episodes=episodes, examples=examples, sims=sims,
                    seconds=dt, sims_per_s=sims / max(dt, 1e-9),
                    games_per_s=episodes / max(dt, 1e-9))

    def train(self) -> dict:
        cfg = self.cfg.train
        total = self._train_steps_per_iter()
        # fresh optimizer per iteration: the reference rebuilds AdamW+OneCycle
        # on every nnet.train() call (GenericNNetWrapper.py:49-51)
        # steps run in fixed-size device chunks (one transfer + one compiled
        # program per chunk; a per-step host loop measured ~70 ms/step
        # through the accelerator tunnel); total is padded up to a whole
        # number of chunks so only one program shape ever compiles
        from alphazero_tpu.train.learner import train_chunk
        CHUNK = 64
        n_chunks = max(1, -(-total // CHUNK))
        total = n_chunks * CHUNK
        self.state = init_train_state(self.state.params, cfg, total)
        # cross-iteration peak-LR anneal (reference staged recipe,
        # README.md:157-163); travels as a traced scalar so no recompile
        from alphazero_tpu.train.learner import peak_lr_scale
        lr_scale = peak_lr_scale(cfg, self.iteration)
        losses = []
        for _ in range(n_chunks):
            # batches travel ENCODED (sparse pi + packed valids) and decode
            # on device inside the jitted chunk — the dense f32 form is ~20x
            # the bytes over the host->device link
            samples = [self.replay.sample(self.np_rng, cfg.batch_size,
                                          window=self._history_window())
                       for _ in range(CHUNK)]
            from alphazero_tpu.parallel.mesh import host_to_global
            batches = host_to_global(
                {kk: np.stack([s[kk] for s in samples])
                 for kk in ("state", "pi_vals", "pi_idx", "z", "q",
                            "valids")}, self.mesh)
            batches = {kk: jnp.asarray(v) for kk, v in batches.items()}
            self.state, ms = train_chunk(
                self.spec, self.net, cfg, total, self.state, batches,
                self._next_key(), augment=cfg.symmetry_augment,
                mesh=self.mesh, lr_scale=lr_scale)
            import types as _types
            ms_host = jax.device_get(ms)
            losses.extend(
                _types.SimpleNamespace(loss=ms_host.loss[i],
                                       loss_pi=ms_host.loss_pi[i],
                                       loss_v=ms_host.loss_v[i])
                for i in range(CHUNK))
        out = dict(steps=total,
                   lr_peak=float(cfg.learn_rate * lr_scale),
                   loss=float(np.mean([float(m.loss) for m in losses])),
                   loss_pi=float(np.mean([float(m.loss_pi) for m in losses])),
                   loss_v=float(np.mean([float(m.loss_v) for m in losses])))
        # held-out loss each iteration so replay overfit is visible in-loop
        # (the reference tracks validation loss during training,
        # GenericNNetWrapper.py:159-177).  The validation source is the TRUE
        # holdout ring (whole self-play lanes routed there before sampling,
        # never trainable — replay.holdout_lane_mod); if it is empty
        # (holdout disabled or not yet fed) fall back to the newest replay
        # rows, which is a freshness diagnostic rather than overfit
        # detection.  Also a value-head health diagnostic corr(v, z).
        src = self.replay.val \
            if (self.replay.val is not None and self.replay.val.size >= 64) \
            else self.replay
        out["val_holdout"] = src is not self.replay
        n_val = min(src.size, 4096)
        if n_val >= 64:
            from alphazero_tpu.parallel.mesh import (fetch_replicated,
                                                     host_to_global)
            from alphazero_tpu.train.learner import evaluate_loss
            ids = (src.head - 1 - np.arange(n_val)) % src.capacity
            vb = {k: jnp.asarray(v) for k, v in host_to_global(dict(
                state=src.state[ids],
                pi_vals=src.pi_vals[ids],
                pi_idx=src.pi_idx[ids],
                z=src.z[ids],
                q=src.q[ids],
                valids=src.valids[ids]), self.mesh).items()}
            out["val_loss"] = float(evaluate_loss(
                self.spec, self.net, self.state.params, vb,
                q_weight=cfg.q_weight))
            if not hasattr(self, "_val_forward"):
                def _fwd(params, state_rows, valids_packed):
                    from alphazero_tpu.selfplay.codec import unpack_bool
                    obs = jax.vmap(self.spec.observe)(state_rows)
                    return self.net.apply(
                        params, obs,
                        unpack_bool(valids_packed, self.spec.num_actions))[1]
                self._val_forward = jax.jit(_fwd)
            v = fetch_replicated(
                self._val_forward(self.state.params, vb["state"],
                                  vb["valids"]), self.mesh)
            v0 = np.asarray(v)[:, 0]
            z0 = np.asarray(vb["z"])[:, 0]
            denom = v0.std() * z0.std()
            out["value_corr"] = float(
                np.mean((v0 - v0.mean()) * (z0 - z0.mean())) / denom) \
                if denom > 1e-6 else 0.0
        return out

    def gate(self) -> dict:
        """Arena new-vs-previous; accept/rollback (Coach.py:200-215)."""
        cfg = self.cfg
        # auto-routes to the host move-loop on engines whose whole-game
        # arena scan trips the TPU long-scan fault (docs/tpu_limits.md)
        res = play_matches_auto(self.spec, self.net, self.state.params,
                                self.prev_params, self._next_key(),
                                cfg=cfg.mcts, num_games=cfg.train.arena_games,
                                temp_half_life=cfg.selfplay.temp_half_life)
        nwins, pwins, draws = (int(res.one_wins), int(res.two_wins),
                               int(res.draws))
        decided = nwins + pwins
        accepted = decided > 0 and nwins / decided >= cfg.train.update_threshold
        if accepted:
            self.prev_params = self.state.params
            self.consecutive_failures = 0
        else:
            # rollback to pre-train params (reference reloads temp.pt)
            self.state = self.state.replace(params=self.prev_params)
            self.consecutive_failures += 1
        return dict(nwins=nwins, pwins=pwins, draws=draws,
                    unfinished=int(res.unfinished), accepted=accepted)

    # ------------------------------------------------------------------

    def _dirichlet_advisory(self):
        """Average branching factor vs the configured alpha (the reference
        warns when alpha strays from ~10/avg_valids, Coach.py:169-176)."""
        if self.replay.size == 0:
            return
        n = min(self.replay.size, 4096)
        # valids are bit-packed in the buffer; popcount via unpackbits
        avg_valids = float(
            np.unpackbits(self.replay.valids[:n], axis=-1).sum(-1).mean())
        advised = 10.0 / max(avg_valids, 1.0)
        alpha = self.cfg.mcts.dirichlet_alpha
        if alpha > 0 and not (0.5 * advised <= alpha <= 2.0 * advised):
            log.warning("dirichlet alpha %.3f far from advised %.3f "
                        "(avg %.1f valid moves)", alpha, advised, avg_valids)

    def run_iteration(self) -> dict:
        self.iteration += 1
        metrics = dict(iteration=self.iteration)
        if not (self.skip_first_selfplay and self.iteration == 1):
            metrics["selfplay"] = self.self_play()
            self._dirichlet_advisory()
        t0 = time.time()
        metrics["train"] = self.train()
        metrics["train"]["seconds"] = time.time() - t0
        # the candidate is always persisted, accepted or not (the reference
        # writes temp.pt every iteration, Coach.py:192)
        self.save("temp")
        t0 = time.time()
        metrics["gate"] = self.gate()
        metrics["gate"]["seconds"] = time.time() - t0
        g = metrics["gate"]
        log.info("iter %d: new vs prev %d-%d (%d draws) -> %s",
                 self.iteration, g["nwins"], g["pwins"], g["draws"],
                 "ACCEPTED" if g["accepted"] else
                 f"REJECTED ({self.consecutive_failures})")
        if g["accepted"]:
            self.save(checkpoint_name(self.iteration))
            self.save("best")
        self.history.append(metrics)
        if self.metrics_log is not None:
            self.metrics_log.log(metrics)
        # crash durability: persist replay + loop state every iteration,
        # AFTER the gate so a resume sees the post-gate failure count
        # (reference saves its example history each iteration,
        # /root/reference/Coach.py:167-184)
        if jax.process_index() == 0 and self.cfg.checkpoint_dir:
            self.replay.save(os.path.join(self.cfg.checkpoint_dir,
                                          "replay.npz"))
            import json
            tmp = os.path.join(self.cfg.checkpoint_dir, "loop_state.tmp")
            with open(tmp, "w") as f:
                json.dump(dict(iteration=self.iteration,
                               consecutive_failures=self.consecutive_failures,
                               iter_adds=self.iter_adds[-max(
                                   1, self.cfg.train.num_iters_history):]),
                          f)
            os.replace(tmp, os.path.join(self.cfg.checkpoint_dir,
                                         "loop_state.json"))
        return metrics

    def learn(self):
        for _ in range(self.cfg.train.num_iters):
            self.run_iteration()
            if self.consecutive_failures >= self.cfg.train.stop_after_n_fail:
                log.error("stopping after %d consecutive failed gates",
                          self.consecutive_failures)
                break
        return self.history

    # ------------------------------------------------------------------

    def save(self, name: str):
        """opt_state is deliberately NOT saved: the optimizer is rebuilt from
        scratch on every train() call (reference GenericNNetWrapper.py:49-51),
        so a stored opt_state could never be used on restore."""
        path = os.path.join(self.cfg.checkpoint_dir, name)
        save_checkpoint(path, self.state.params, self.cfg,
                        meta=dict(
                            iteration=self.iteration,
                            consecutive_failures=self.consecutive_failures))

    def load(self, path: str):
        params, cfg_in_ckpt, meta, transferred = load_checkpoint(
            path, self.state.params)
        self.state = self.state.replace(params=params)
        self.prev_params = params
        self.iteration = int(meta.get("iteration", 0))
        self.consecutive_failures = int(meta.get("consecutive_failures", 0))
        self.skip_first_selfplay = transferred
        ckpt_dir = os.path.dirname(path.rstrip("/"))
        # loop_state.json (written after every gate) supersedes the
        # checkpoint's own meta: it reflects rejected-gate iterations that
        # never produced a new checkpoint
        ls_path = os.path.join(ckpt_dir, "loop_state.json")
        if os.path.exists(ls_path):
            import json
            with open(ls_path) as f:
                ls = json.load(f)
            self.iteration = int(ls.get("iteration", self.iteration))
            self.consecutive_failures = int(
                ls.get("consecutive_failures", self.consecutive_failures))
            self.iter_adds = [int(x) for x in ls.get("iter_adds", [])]
        replay_path = os.path.join(ckpt_dir, "replay.npz")
        if os.path.exists(replay_path):
            self.replay.load(replay_path)
        return cfg_in_ckpt, transferred
