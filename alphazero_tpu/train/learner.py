"""Learner: losses, optimizer, jitted train step.

Reference semantics (/root/reference/GenericNNetWrapper.py:44-92,179-190):
- AdamW + OneCycle LR over epochs*batches
- policy loss: KLDiv(batchmean) of MCTS visit policy vs masked log-softmax
- value loss: MSE against (Z + q_weight*Q)/(1+q_weight), normalized by
  batch*num_players, weighted 0.25 in the total
TPU-first: one jitted train_step; optional per-sample random symmetry
augmentation on device (the reference instead stores all 8 symmetric copies
in the replay buffer, Coach.py:65-69 — same training distribution).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from alphazero_tpu.config import TrainConfig
from alphazero_tpu.games.base import GameSpec


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


class TrainMetrics(NamedTuple):
    loss: jax.Array
    loss_pi: jax.Array
    loss_v: jax.Array
    lr: jax.Array


def make_lr_schedule(cfg: TrainConfig, total_steps: int, lr_scale=1.0):
    """OneCycle (torch defaults: pct_start .3, div 25, final_div 1e4 —
    matches optax.cosine_onecycle_schedule).  lr_scale multiplies the whole
    cycle; it may be a TRACED scalar so the Coach can anneal the peak across
    iterations (TrainConfig.lr_anneal_iters) without recompiling the step."""
    sched = optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 1), peak_value=cfg.learn_rate,
        pct_start=0.3, div_factor=25.0, final_div_factor=1e4)
    return lambda step: sched(step) * lr_scale


def peak_lr_scale(cfg: TrainConfig, iteration: int) -> float:
    """Cross-iteration anneal factor on the OneCycle peak: log-interp from
    1.0 (peak = learn_rate) at iteration 1 to lr_final/learn_rate at
    iteration lr_anneal_iters+1 (the reference's staged recipe anneals
    3e-3 -> 3e-4 across training, /root/reference/README.md:157-163).
    1.0 when annealing is disabled."""
    if cfg.lr_anneal_iters <= 0:
        return 1.0
    frac = min(max(iteration - 1, 0), cfg.lr_anneal_iters) \
        / cfg.lr_anneal_iters
    return float((cfg.lr_final / cfg.learn_rate) ** frac)


def make_optimizer(cfg: TrainConfig, total_steps: int, lr_scale=1.0):
    sched = make_lr_schedule(cfg, total_steps, lr_scale)
    # global-norm clipping: unclipped AdamW at OneCycle peak measured NaN
    # divergence on small replay buffers (all params NaN after a PBT trial)
    opt = optax.chain(optax.clip_by_global_norm(10.0),
                      optax.adamw(learning_rate=sched))
    return opt, sched


def init_train_state(params, cfg: TrainConfig, total_steps: int) -> TrainState:
    opt, _ = make_optimizer(cfg, total_steps)
    return TrainState(params=params, opt_state=opt.init(params),
                      step=jnp.int32(0))


def loss_pi(target_pi, log_pi):
    """KLDivLoss(batchmean): sum(p * (log p - log q)) / B, with 0*log0 = 0."""
    logp_t = jnp.where(target_pi > 0, jnp.log(jnp.maximum(target_pi, 1e-30)),
                       0.0)
    kl = jnp.sum(target_pi * (logp_t - log_pi), axis=-1)
    return jnp.mean(kl)


def loss_v(target_z, target_q, v, q_weight: float):
    tgt = (target_z + q_weight * target_q) / (1.0 + q_weight)
    return jnp.sum((tgt - v) ** 2) / (v.shape[0] * v.shape[-1])


def _augment(spec: GameSpec, key, state, pi, valids):
    """Random symmetry per sample, on device."""
    st, pis, vas = jax.vmap(spec.symmetries)(state, pi, valids)
    idx = jax.random.randint(key, (state.shape[0],), 0, spec.num_symmetries)
    b = jnp.arange(state.shape[0])
    return st[b, idx], pis[b, idx], vas[b, idx]


def _maybe_decode(spec: GameSpec, batch):
    """Encoded batches (sparse pi + packed valids, see selfplay/codec.py)
    are decoded on device; dense dict batches pass through."""
    if "pi_vals" in batch:
        from alphazero_tpu.selfplay.codec import decode_batch
        return decode_batch(batch, spec.num_actions)
    return batch


def _train_step_impl(spec, net, cfg, total_steps, state, batch, key,
                     augment, mesh, lr_scale=1.0):
    opt, sched = make_optimizer(cfg, total_steps, lr_scale)
    batch = _maybe_decode(spec, batch)

    if mesh is not None:
        # shard the batch over 'data'; params stay replicated so GSPMD
        # inserts the gradient all-reduce over ICI automatically
        from jax.sharding import NamedSharding, PartitionSpec

        def shard_b(x):
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh,
                                 PartitionSpec("data",
                                               *([None] * (x.ndim - 1)))))

        batch = jax.tree.map(shard_b, batch)

    st, pi_t, valids = batch["state"], batch["pi"], batch["valids"]
    if augment and spec.symmetries is not None:
        st, pi_t, valids = _augment(spec, key, st, pi_t, valids)
    obs = jax.vmap(spec.observe)(st)

    def loss_fn(params):
        log_pi, v = net.apply(params, obs, valids)
        l_pi = loss_pi(pi_t, log_pi)
        l_v = loss_v(batch["z"], batch["q"], v, cfg.q_weight)
        return l_pi + cfg.value_loss_weight * l_v, (l_pi, l_v)

    (loss, (l_pi, l_v)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(params=params, opt_state=opt_state,
                           step=state.step + 1)
    return new_state, TrainMetrics(loss=loss, loss_pi=l_pi, loss_v=l_v,
                                   lr=sched(state.step))


@functools.partial(jax.jit, static_argnames=("spec", "net", "cfg",
                                             "total_steps", "augment",
                                             "mesh"))
def train_step(spec: GameSpec, net, cfg: TrainConfig, total_steps: int,
               state: TrainState, batch, key, augment: bool = True,
               mesh=None, lr_scale=1.0) -> Tuple[TrainState, TrainMetrics]:
    return _train_step_impl(spec, net, cfg, total_steps, state, batch, key,
                            augment, mesh, lr_scale)


@functools.partial(jax.jit, static_argnames=("spec", "net", "q_weight"))
def evaluate_loss(spec: GameSpec, net, params, batch, q_weight: float = 0.5):
    """Validation loss (reference GenericNNetWrapper.evaluate, :159-177)."""
    batch = _maybe_decode(spec, batch)
    obs = jax.vmap(spec.observe)(batch["state"])
    log_pi, v = net.apply(params, obs, batch["valids"])
    return (loss_pi(batch["pi"], log_pi)
            + loss_v(batch["z"], batch["q"], v, q_weight))


@functools.partial(jax.jit, static_argnames=("spec", "net", "cfg",
                                             "total_steps", "augment",
                                             "mesh"))
def train_chunk(spec: GameSpec, net, cfg: TrainConfig, total_steps: int,
                state: TrainState, batches, key, augment: bool = True,
                mesh=None, lr_scale=1.0):
    """Run K train steps as ONE device program (lax.scan over stacked
    (K, B, ...) batches).  The per-step host loop costs ~70 ms/step through
    the accelerator tunnel (dispatch + per-batch transfer); chunking
    amortizes it to one transfer + one dispatch per K steps."""
    def body(st, xs):
        batch, k = xs
        st, m = _train_step_impl(spec, net, cfg, total_steps, st, batch, k,
                                 augment, mesh, lr_scale)
        return st, m
    K = jax.tree.leaves(batches)[0].shape[0]
    keys = jax.random.split(key, K)
    state, ms = jax.lax.scan(body, state, (batches, keys))
    return state, ms
