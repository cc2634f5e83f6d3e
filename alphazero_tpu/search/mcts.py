"""Batched on-device MCTS.

TPU-native re-design of the reference MCTS (/root/reference/MCTS.py:19-261):
instead of N Python threads funnelling single-board NN evals into one batched
ONNX call (GenericNNetWrapper.py:122-157), B independent trees run in lockstep
inside one jitted lax.scan — each simulation's leaf evaluations across all
trees form one natural NN batch on the MXU.

Preserved algorithmic package (per SURVEY.md §7): PUCT + FPU + forced
playouts (root only) + policy-target pruning + Dirichlet(auto-alpha) root
noise + softmax prior temperature + playout-cap randomization budgets +
Q tracking + per-player value vectors + universes magic seeds.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from alphazero_tpu.config import MCTSConfig, MAGIC_SEEDS
from alphazero_tpu.games.base import GameSpec
from alphazero_tpu.search.tree import (
    FORCED_K, Tree, backup_dense, dense_best_action, expand_batch, grow_tree,
    init_root, make_tree, walk_path)

# eval_fn(eval_args, obs (B,...), valids (B,A)) -> (prior (B,A) normalized,
# value (B,P)).  eval_args is an arbitrary traced pytree (params, or
# (params_a, params_b, lane_mask) for arena play) so callers can jit whole
# loops around mcts_search without capturing tracers in static closures.
EvalFn = Callable[[Any, jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]


class MCTSOutput(NamedTuple):
    counts: jax.Array       # (B, A) float32 — visit counts, pruning applied
    q: jax.Array            # (B, P) float32 — root Q expanded per player
    root_valids: jax.Array  # (B, A) bool
    root_prior: jax.Array   # (B, A) — post-noise root prior
    tree_nodes: jax.Array   # (B,) int32 — nodes used (diagnostics)


def _power_temp(p: jax.Array, temp: float) -> jax.Array:
    """Reference 'softmax' on the root prior: p**(1/t), renormalized
    (/root/reference/MCTS.py:255-261)."""
    if temp == 1.0:
        return p
    q = p ** (1.0 / temp)
    return q / jnp.sum(q, axis=-1, keepdims=True)


def add_dirichlet(key, prior, valids, alpha: float):
    """Root Dirichlet noise over valid moves only
    (/root/reference/MCTS.py:187-197).  alpha < 0 => auto 10/n_valid."""
    n_valid = jnp.sum(valids, axis=-1, keepdims=True)
    if alpha > 0:
        a = jnp.full(prior.shape, alpha, prior.dtype)
    else:
        a = jnp.broadcast_to(10.0 / jnp.maximum(n_valid, 1), prior.shape)
    g = jax.random.gamma(key, jnp.where(valids, a, 1.0)).astype(prior.dtype)
    g = jnp.where(valids, g, 0.0)
    noise = g / jnp.maximum(jnp.sum(g, axis=-1, keepdims=True), 1e-30)
    return jnp.where(valids, 0.75 * prior + 0.25 * noise, prior)


def mcts_search(spec: GameSpec, eval_fn: EvalFn, eval_args,
                root_states: jax.Array, key: jax.Array, budgets: jax.Array,
                noise_mask: jax.Array, forced_mask: jax.Array, *,
                cfg: MCTSConfig, num_sims_max: int,
                use_noise: bool = True, init_tree=None, reuse_mask=None,
                extra_nodes: int = 0) -> Tuple[MCTSOutput, Any]:
    """Run MCTS from B root states (pure; callers may jit around it).

    budgets:     (B,) int32 — per-lane simulation budgets (<= num_sims_max);
                 playout-cap randomization runs full/fast lanes in one scan.
    noise_mask:  (B,) bool — apply root Dirichlet noise (full-search lanes
                 during self-play; reference MCTS.py:64).
    forced_mask: (B,) bool — forced playouts + policy target pruning.
    init_tree / reuse_mask: cross-move tree reuse (reference MCTS.py:85-91):
                 a re-rooted Tree from tree.extract_subtree whose node arenas
                 seed the masked lanes; fresh root Dirichlet noise is applied
                 to the stored root prior like the reference's per-call
                 applyDirNoise.  Reuse is dropped automatically on lanes
                 whose stored root state differs from root_states (chance
                 moves resolved differently than the search assumed).
    extra_nodes: widen the arena beyond num_sims_max+1 so reused subtrees
                 plus the new simulation budget fit.
    Returns (output, final_trees); final_trees feeds extract_subtree.
    """
    B = root_states.shape[0]
    qdt = jnp.dtype(cfg.q_dtype)
    pdt = jnp.dtype(cfg.prior_dtype)
    N = num_sims_max + 1 + extra_nodes

    # --- root expansion (simulation 0, reference MCTS.py:140-154) ----------
    root_valids = jax.vmap(spec.valids)(root_states)
    prior0, v0 = eval_fn(eval_args, jax.vmap(spec.observe)(root_states),
                         root_valids)
    if init_tree is not None:
        assert init_tree.prior.shape[1] == N, (
            f"init_tree has {init_tree.prior.shape[1]} nodes, need {N}")
        state_match = jnp.all(
            init_tree.states[:, 0] == root_states,
            axis=tuple(range(1, root_states.ndim)))
        rm = reuse_mask & state_match
        stored_p = init_tree.prior[:, 0].astype(prior0.dtype)
        root_valids = jnp.where(rm[:, None], stored_p >= 0, root_valids)
        prior0 = jnp.where(rm[:, None], jnp.maximum(stored_p, 0), prior0)
    if use_noise:
        p = _power_temp(prior0, cfg.temp_soft)
        p = add_dirichlet(jax.random.fold_in(key, 0), p, root_valids,
                          cfg.dirichlet_alpha)
        p = p / jnp.maximum(jnp.sum(p, -1, keepdims=True), 1e-30)
        prior0 = jnp.where(noise_mask[:, None], p, prior0)

    # staged arena growth: sim s only needs s+1 node slots and per-sim pass
    # cost scales with arena width, so the sim scan runs in k stages over
    # growing arenas (pure padding between stages — bit-exact).  Disabled
    # when a reused subtree seeds the arena: its width is dynamic per lane.
    n_steps_plan = num_sims_max + (1 if init_tree is not None else 0)
    # the dyn path has its own (default-off) staging knob: dyn_stages>1
    # splits the while_loop into k width stages (one compiled body each)
    k_plan = cfg.dyn_stages if cfg.dyn_sims else cfg.arena_stages
    k_stages = 1 if init_tree is not None else max(1, k_plan)
    total_sims = n_steps_plan - 1
    if k_stages > 1 and total_sims > k_stages:
        ends = sorted({1 + (total_sims * k) // k_stages
                       for k in range(1, k_stages + 1)})
        stage_sizes = [min(N, e + 1) for e in ends]
        stage_sizes[-1] = N
    else:
        ends = [n_steps_plan]
        stage_sizes = [N]

    trees = make_tree(spec, B, stage_sizes[0], qdt, pdt, dtype_nodes=N)
    trees = init_root(trees, root_states, root_valids, prior0, v0[:, 0])
    if init_tree is not None:
        # reused lanes take the whole carried arena, with the root prior row
        # replaced by the (re-noised) prior computed above
        pr_root = jnp.where(root_valids, prior0.astype(pdt),
                            jnp.asarray(-1, pdt))
        src = init_tree.replace(prior=init_tree.prior.at[:, 0].set(pr_root))

        def blend(a, b):
            m = rm.reshape((B,) + (1,) * (a.ndim - 1))
            return jnp.where(m, a, b)

        trees = jax.tree.map(blend, src, trees)

    magic = jnp.asarray(MAGIC_SEEDS, jnp.int32)

    # a reused root is ALREADY expanded, so all `budget` simulations add
    # root-edge visits (the reference's getActionProb runs numMCTSSims
    # descents on an existing dict node); fresh roots spend one on expansion
    # (the sim index range 1..n_steps_plan-1 is fixed by the stage plan above)
    if init_tree is not None:
        eff_budgets = budgets + rm.astype(jnp.int32)
    else:
        eff_budgets = budgets

    # The PUCT argmax for simulation s is computed at the END of simulation
    # s-1 (carried through the scan): XLA then fuses backup's nsa/qsa
    # read-modify-write with the PUCT pass into ONE traversal of the
    # (B, N, A) arrays instead of two (backup writes, PUCT re-reads).
    def one_sim(carry, sim_idx):
        trees, best, code = carry
        active = sim_idx < eff_budgets                  # (B,)
        skey = jax.random.fold_in(key, sim_idx)
        # universes: deterministic chance seed per simulation
        # (reference MCTS.py:62-63); <=0 => true-random via PRNG key.
        if cfg.universes > 0:
            seed = magic[sim_idx % cfg.universes]
        else:
            seed = jnp.int32(-1)
        seeds = jnp.full((B,), seed, jnp.int32)

        walk = walk_path(trees, best, code, depth_cap=cfg.max_depth)

        # row select via masked reduce (adv-index gathers lower poorly here;
        # exactly one row is selected per lane so the sum IS the row)
        iota_n = jax.lax.broadcasted_iota(jnp.int32, trees.states.shape[:2], 1)
        sel = (iota_n == walk.parent[:, None]).reshape(
            trees.states.shape[:2] + (1,) * (trees.states.ndim - 2))
        parent_states = jnp.sum(
            jnp.where(sel, trees.states, 0), axis=1,
            dtype=trees.states.dtype)
        step_keys = jax.random.split(skey, B)
        child_state, child_swap = jax.vmap(spec.step_canonical)(
            parent_states, walk.action, step_keys, seeds)
        child_valids = jax.vmap(spec.valids)(child_state)
        child_term = jax.vmap(spec.terminal)(child_state)
        child_prior, child_value = eval_fn(
            eval_args, jax.vmap(spec.observe)(child_state), child_valids)

        trees, leaf, v_leaf, leaf_swap = expand_batch(
            trees, walk, child_state, child_swap, child_valids, child_prior,
            child_value, child_term, active)
        trees = backup_dense(trees, walk, best, v_leaf, leaf_swap, active)
        best_next, code_next = dense_best_action(
            trees, cfg.cpuct, cfg.fpu, forced_mask, sim_idx + 1)
        return (trees, best_next, code_next), None

    best0, code0 = dense_best_action(trees, cfg.cpuct, cfg.fpu, forced_mask,
                                     jnp.int32(1))
    carry = (trees, best0, code0)
    if cfg.dyn_sims:
        # DATA-DEPENDENT trip count: the simulation loop runs to the max
        # live budget as a lax.while_loop the backend cannot unroll — the
        # compiled program is one sim body per width stage regardless of
        # num_sims (the known-trip-count scans below are what blow up
        # compile resources on scan-fault engines, docs/tpu_limits.md).
        # Bit-exact with the scan path: identical sim_idx stream, inactive
        # sims are masked no-ops either way.  dyn_stages=1 (default) is the
        # round-4 single full-width loop; dyn_stages>1 runs the while_loop
        # in k width stages over the same grow-and-pad plan as the scan
        # path, recovering the staging savings (per-sim pass cost scales
        # with arena width).  A stage whose window is already past the max
        # live budget has a false cond immediately and costs only padding.
        end_dyn = jnp.minimum(jnp.max(eff_budgets) + 1,
                              jnp.int32(n_steps_plan))

        def body(st):
            sim_idx, c = st
            c, _ = one_sim(c, sim_idx)
            return (sim_idx + 1, c)

        sim_c = jnp.int32(1)
        for end, size in zip(ends, stage_sizes):
            t, b, c = carry
            if size > t.prior.shape[1]:
                dn = size - t.prior.shape[1]
                t = grow_tree(t, size)
                b = jnp.pad(b, ((0, 0), (0, dn)))
                c = jnp.pad(c, ((0, 0), (0, dn)), constant_values=-1)
            carry = (t, b, c)
            end_k = jnp.minimum(end_dyn, jnp.int32(end))
            sim_c, carry = jax.lax.while_loop(
                lambda st, e=end_k: st[0] < e, body, (sim_c, carry))
    else:
        start = 1
        for end, size in zip(ends, stage_sizes):
            t, b, c = carry
            if size > t.prior.shape[1]:
                dn = size - t.prior.shape[1]
                t = grow_tree(t, size)
                b = jnp.pad(b, ((0, 0), (0, dn)))
                c = jnp.pad(c, ((0, 0), (0, dn)), constant_values=-1)
            carry, _ = jax.lax.scan(one_sim, (t, b, c),
                                    jnp.arange(start, end, dtype=jnp.int32))
            start = end
    trees = carry[0]

    # --- outputs (reference getActionProb, MCTS.py:67-83) -------------------
    counts = trees.nsa[:, 0].astype(jnp.float32)        # (B, A)
    q0 = trees.qs[:, 0].astype(jnp.float32)             # (B,)
    # root Q expanded to a per-player vector (MCTS.py:70-72)
    P = spec.num_players
    q = jnp.concatenate(
        [q0[:, None], jnp.tile((-q0 / (P - 1))[:, None], (1, P - 1))], axis=1)

    # policy target pruning (KataGo; MCTS.py:75-80)
    # (tree prior uses -1 as the invalid sentinel; strip it for output)
    root_prior = trees.prior[:, 0].astype(jnp.float32)
    root_prior = jnp.where(root_prior >= 0, root_prior, 0.0)
    best = jnp.max(counts, axis=-1, keepdims=True)
    sub = jnp.floor(jnp.sqrt(
        FORCED_K * root_prior * budgets[:, None].astype(jnp.float32)))
    adjusted = jnp.where(counts == best, counts, counts - sub)
    adjusted = jnp.where(adjusted > 1, adjusted, 0.0)
    counts = jnp.where(forced_mask[:, None], adjusted, counts)

    return MCTSOutput(counts=counts, q=q, root_valids=root_valids,
                      root_prior=root_prior,
                      tree_nodes=trees.next_free), trees


@functools.partial(
    jax.jit,
    static_argnames=("spec", "eval_fn", "cfg", "num_sims_max", "use_noise"))
def run_mcts(spec: GameSpec, eval_fn, root_states, key, budgets, noise_mask,
             forced_mask, *, cfg: MCTSConfig, num_sims_max: int,
             use_noise: bool = True, eval_args=None) -> MCTSOutput:
    """Jitted convenience wrapper around mcts_search for standalone use;
    eval_fn here takes (eval_args, obs, valids) with eval_args traced."""
    out, _ = mcts_search(spec, eval_fn, eval_args, root_states, key, budgets,
                         noise_mask, forced_mask, cfg=cfg,
                         num_sims_max=num_sims_max, use_noise=use_noise)
    return out


# ---------------------------------------------------------------------------
# Action selection from visit counts (temperature semantics of the reference
# getActionProb tail, MCTS.py:93-103, + Coach.random_pick, Coach.py:278-292).
# ---------------------------------------------------------------------------

def clamp_to_valid(action, valids):
    """Route degenerate selections (NaN policies, all-zero counts) to the
    first valid action so a broken net can never emit an illegal move."""
    ok = jnp.take_along_axis(valids, action[:, None], axis=1)[:, 0]
    return jnp.where(ok, action, jnp.argmax(valids, axis=-1))


def sample_action(key, counts, temp):
    """Sample ∝ counts**(1/temp); temp <= 0.02 => uniform over argmaxes."""
    logc = jnp.where(counts > 0, jnp.log(jnp.maximum(counts, 1e-30)), -jnp.inf)
    logits_t = logc / jnp.maximum(temp, 1e-6)
    ties = counts >= jnp.max(counts, axis=-1, keepdims=True)
    logits_am = jnp.where(ties, 0.0, -jnp.inf)
    logits = jnp.where(temp <= 0.02, logits_am, logits_t)
    return jax.random.categorical(key, logits, axis=-1)


def argmax_action(key, counts, temp):
    """Arena/pit action: argmax of the tempered policy — first-index argmax
    for temp > 0.02, random tie-break among maxima otherwise
    (reference pit.py:59-63 + MCTS.py:93-98)."""
    first = jnp.argmax(counts, axis=-1)
    ties = counts >= jnp.max(counts, axis=-1, keepdims=True)
    logits_am = jnp.where(ties, 0.0, -jnp.inf)
    rnd = jax.random.categorical(key, logits_am, axis=-1)
    return jnp.where(temp <= 0.02, rnd, first)


def temp_for_selfplay(cfg, n):
    """Exponential decay temperature (reference Coach.py:266-271)."""
    t0, t1, hl = cfg.temp_begin, cfg.temp_end, cfg.temp_half_life
    if hl < 0:
        return jnp.where(n > -hl, t1, t0)
    return t1 + (t0 - t1) * 0.5 ** (n / hl)


def temp_for_game(half_life, n):
    """Arena temperature decay 0.5 -> 0 (reference Coach.py:274-276)."""
    return 0.5 * 0.5 ** (n / abs(half_life))
