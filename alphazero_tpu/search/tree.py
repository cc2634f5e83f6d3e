"""Fixed-size array search trees for batched on-device MCTS.

The reference stores one dict entry per state keyed by board bytes
(/root/reference/MCTS.py:39-47,125-126).  On TPU that becomes a preallocated
node arena per tree: ``num_sims`` simulations expand at most ``num_sims``
nodes, so every array has a static leading node dimension and thousands of
trees run in lockstep under ``vmap``.

Divergence from the reference (documented, see SURVEY.md §7 "hard parts"):
nodes are tree-shaped (parent pointers), not a transposition table — two
paths reaching the same state create two nodes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from alphazero_tpu.games.base import GameSpec

# Reference constants (/root/reference/MCTS.py:10-14).
EPS = 1e-8
FORCED_K = 0.5


@struct.dataclass
class Tree:
    """One search tree (no leading batch dim; callers vmap).

    Node 0 is the root.  ``children[n, a] == -1`` means edge (n, a) has not
    been expanded.  Value vectors are per-player in each node's own canonical
    frame (index 0 = player to move at that node).
    """

    states: jax.Array         # (N, *state_shape) int8
    prior: jax.Array          # (N, A) prior_dtype — NN policy (root: + noise)
    valid: jax.Array          # (N, A) bool
    term_val: jax.Array       # (N, P) float32 — terminal result vector
    is_term: jax.Array        # (N,) bool
    n_visit: jax.Array        # (N,) int32 — Ns
    nsa: jax.Array            # (N, A) int32
    qsa: jax.Array            # (N, A) q_dtype
    qs: jax.Array             # (N,) q_dtype — running node value
    children: jax.Array       # (N, A) int32
    parent: jax.Array         # (N,) int32
    parent_action: jax.Array  # (N,) int32
    swap: jax.Array           # (N,) int32 — player shift parent -> this node
    next_free: jax.Array      # () int32


def empty_tree(spec: GameSpec, num_nodes: int, q_dtype=jnp.float32,
               prior_dtype=jnp.float32) -> Tree:
    N, A, P = num_nodes, spec.num_actions, spec.num_players
    return Tree(
        states=jnp.zeros((N, *spec.state_shape), jnp.int8),
        prior=jnp.zeros((N, A), prior_dtype),
        valid=jnp.zeros((N, A), bool),
        term_val=jnp.zeros((N, P), jnp.float32),
        is_term=jnp.zeros((N,), bool),
        n_visit=jnp.zeros((N,), jnp.int32),
        nsa=jnp.zeros((N, A), jnp.int32),
        qsa=jnp.zeros((N, A), q_dtype),
        qs=jnp.zeros((N,), q_dtype),
        children=jnp.full((N, A), -1, jnp.int32),
        parent=jnp.zeros((N,), jnp.int32),
        parent_action=jnp.zeros((N,), jnp.int32),
        swap=jnp.zeros((N,), jnp.int32),
        next_free=jnp.int32(1),
    )


def init_root(tree: Tree, state, valids, prior, value0) -> Tree:
    """Install the root node (the reference's first search() call — the
    Ps-is-None expansion branch, /root/reference/MCTS.py:140-154)."""
    return tree.replace(
        states=tree.states.at[0].set(state),
        prior=tree.prior.at[0].set(prior.astype(tree.prior.dtype)),
        valid=tree.valid.at[0].set(valids),
        qs=tree.qs.at[0].set(value0.astype(tree.qs.dtype)),
        next_free=jnp.int32(1),
    )


def puct_action(tree: Tree, node, cpuct: float, fpu: float,
                forced_now, sim_idx) -> jax.Array:
    """Action selection — reference pick_highest_UCB
    (/root/reference/MCTS.py:210-230) vectorized over actions.

    forced_now: traced bool — forced playouts active for this node this sim
    (the reference applies them only at the root: search() recurses with
    forced_playouts=False, MCTS.py:175).
    """
    qdt = tree.qs.dtype
    P = tree.prior[node].astype(qdt)
    V = tree.valid[node]
    Nsa = tree.nsa[node]
    Qsa = tree.qsa[node]
    Ns = tree.n_visit[node].astype(qdt)
    Qs = tree.qs[node]

    if fpu > 0:          # parent-relative FPU (static config branch)
        fpu_init = Qs - qdt.type(fpu)
    else:                # absolute FPU
        fpu_init = qdt.type(fpu)

    u_unvis = fpu_init + cpuct * P * jnp.sqrt(Ns + EPS)
    u_vis = Qsa + cpuct * P * jnp.sqrt(Ns) / (1 + Nsa).astype(qdt)
    u = jnp.where(Nsa > 0, u_vis, u_unvis)
    u = jnp.where(V, u, -jnp.inf)
    best = jnp.argmax(u).astype(jnp.int32)

    # forced playout: first valid action with Nsa < floor(sqrt(k*P*sim_idx))
    thr = jnp.floor(jnp.sqrt(FORCED_K * P * sim_idx.astype(qdt))).astype(jnp.int32)
    forced_mask = V & (Nsa < thr) & forced_now
    # explicit int32: under jax_enable_x64 argmax yields int64, which would
    # warn (soon error) when scattered into the int32 path buffers
    return jnp.where(jnp.any(forced_mask),
                     jnp.argmax(forced_mask).astype(jnp.int32), best)


def select_leaf(tree: Tree, cpuct: float, fpu: float, allow_forced,
                sim_idx) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Walk from the root to an unexpanded edge or a terminal node.

    Returns (parent, action, existing_child) where existing_child >= 0 iff
    the walk stopped at an already-expanded terminal child (no new node).
    """
    parent, action, existing, _, _, _ = select_leaf_path(
        tree, cpuct, fpu, allow_forced, sim_idx, max_depth=1)
    return parent, action, existing


def select_leaf_path(tree: Tree, cpuct: float, fpu: float, allow_forced,
                     sim_idx, max_depth: int, depth_cap: int = 0):
    """select_leaf that also records the root-to-leaf path.

    Returns (parent, action, existing_child, path_nodes (D,), path_actions
    (D,), depth).  path_nodes[d] / path_actions[d] describe edge d; depth is
    the number of edges.  The loop carry holds only scalars and the two (D,)
    buffers, so the batched (vmapped) while_loop's per-iteration select cost
    is O(B*D) — NOT O(B*N*A) as it would be if the visit-count arrays were
    carried (that was measured to dominate self-play wall time).

    depth_cap > 0 additionally stops the walk after depth_cap edges (perf
    knob: the batched while_loop runs max-lane-depth iterations per sim, so
    uncapped descent cost grows quadratically in the sim budget).  A
    cap-stopped walk ends on an existing child; expand_node then backs up
    that node's stored value instead of expanding.
    """
    D = max_depth
    cap = depth_cap if depth_cap > 0 else D + 1

    def pick(node):
        return puct_action(tree, node, cpuct, fpu,
                           allow_forced & (node == 0), sim_idx)

    def cond_fn(c):
        _, _, ch, depth, _, _ = c
        return (ch >= 0) & ~tree.is_term[jnp.maximum(ch, 0)] & (depth < cap)

    def body_fn(c):
        _, _, ch, depth, nodes, acts = c
        cur = ch
        a = pick(cur)
        nodes = nodes.at[jnp.minimum(depth, D - 1)].set(cur)
        acts = acts.at[jnp.minimum(depth, D - 1)].set(a)
        return cur, a, tree.children[cur, a], depth + 1, nodes, acts

    a0 = pick(jnp.int32(0))
    nodes0 = jnp.zeros((D,), jnp.int32)
    acts0 = jnp.zeros((D,), jnp.int32).at[0].set(a0)
    cur, a, ch, depth, nodes, acts = jax.lax.while_loop(
        cond_fn, body_fn,
        (jnp.int32(0), a0, tree.children[0, a0], jnp.int32(1), nodes0, acts0))
    return cur, a, ch, nodes, acts, depth


def expand_node(tree: Tree, parent, action, existing_child, child_state,
                child_swap, child_valids, child_prior, child_value,
                child_term, active) -> Tuple[Tree, jax.Array, jax.Array]:
    """Install a new leaf node if the selected edge was unexpanded.

    Returns (tree, leaf_node, v_leaf) where v_leaf is the value vector to
    back up, in the leaf's own canonical frame (the NN value for new interior
    leaves, the stored/new terminal vector for terminal leaves — reference
    MCTS.py:130-154).
    """
    is_new = existing_child < 0
    child_is_term = jnp.any(child_term != 0)
    new_idx = tree.next_free
    leaf = jnp.where(is_new, new_idx, existing_child)

    old = jnp.maximum(existing_child, 0)
    stored_term = tree.term_val[old]
    # cap-stopped interior revisit: expand the stored scalar Q per player
    P = tree.term_val.shape[1]
    q_old = tree.qs[old].astype(jnp.float32)
    stored_q = jnp.concatenate(
        [q_old[None], jnp.tile(-q_old[None] / (P - 1), (P - 1,))])
    stored_v = jnp.where(tree.is_term[old], stored_term, stored_q)
    v_leaf = jnp.where(is_new,
                       jnp.where(child_is_term, child_term, child_value),
                       stored_v)

    wmask = active & is_new

    def mset(arr, idx, val):
        val = jnp.asarray(val, arr.dtype)
        return arr.at[idx].set(jnp.where(wmask, val, arr[idx]))

    tree = tree.replace(
        states=mset(tree.states, new_idx, child_state),
        prior=mset(tree.prior, new_idx, child_prior),
        valid=mset(tree.valid, new_idx, child_valids),
        term_val=mset(tree.term_val, new_idx, child_term),
        is_term=mset(tree.is_term, new_idx, child_is_term),
        qs=mset(tree.qs, new_idx, v_leaf[0]),
        parent=mset(tree.parent, new_idx, parent),
        parent_action=mset(tree.parent_action, new_idx, action),
        swap=mset(tree.swap, new_idx, child_swap),
        children=tree.children.at[parent, action].set(
            jnp.where(wmask, new_idx, tree.children[parent, action])),
        next_free=tree.next_free + jnp.where(wmask, 1, 0),
    )
    return tree, leaf, v_leaf


def backup_path(tree: Tree, path_nodes, path_actions, depth, leaf,
                v_leaf, active) -> Tree:
    """Back a leaf value up the recorded path with ONE batched gather/scatter
    round — no loop.

    Reference recurrence (MCTS.py:175-183):
        v_parent = np.roll(v_child, swap_child)
        Qsa[a]   = (Nsa*Qsa + v0) / (Nsa+1)
        Qs       = ((Ns+1)*Qs + v0) / (Ns+2)
        Nsa += 1 ; Ns += 1
    Path nodes are distinct (it's a tree), so all updates are conflict-free
    and can be applied in one scatter per array.  Rolls compose (roll(roll(v,
    a), b) == roll(v, a+b)), so the value seen at edge d is
    v_leaf[(-S_d) mod P] with S_d the suffix-sum of child swaps.
    Inactive/overflow edges are routed out of bounds and dropped.
    """
    qdt = tree.qs.dtype
    P = v_leaf.shape[0]
    D = path_nodes.shape[0]
    d_idx = jnp.arange(D)
    valid_edge = (d_idx < depth) & active

    # child of edge d: next path node, except the leaf for the last edge
    child_nodes = jnp.where(d_idx < depth - 1,
                            jnp.roll(path_nodes, -1), leaf)
    sw = jnp.where(valid_edge, tree.swap[child_nodes], 0)
    suffix = jnp.cumsum(sw[::-1])[::-1]                     # S_d
    v0 = v_leaf.astype(qdt)[(-suffix) % P]                  # (D,)

    # out-of-bounds => dropped by scatter mode below
    N = tree.n_visit.shape[0]
    nodes = jnp.where(valid_edge, path_nodes, N)
    acts = path_actions

    n_old = tree.nsa[jnp.minimum(nodes, N - 1), acts]
    q_old = tree.qsa[jnp.minimum(nodes, N - 1), acts]
    q_new = (n_old.astype(qdt) * q_old + v0) / (n_old + 1).astype(qdt)
    ns_old = tree.n_visit[jnp.minimum(nodes, N - 1)].astype(qdt)
    qs_old = tree.qs[jnp.minimum(nodes, N - 1)]
    qs_new = ((ns_old + 1) * qs_old + v0) / (ns_old + 2)

    return tree.replace(
        qsa=tree.qsa.at[nodes, acts].set(q_new, mode="drop"),
        nsa=tree.nsa.at[nodes, acts].add(1, mode="drop"),
        qs=tree.qs.at[nodes].set(qs_new, mode="drop"),
        n_visit=tree.n_visit.at[nodes].add(1, mode="drop"),
    )
