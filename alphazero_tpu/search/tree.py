"""Fixed-size array search trees for batched on-device MCTS — dense edition.

The reference stores one dict entry per state keyed by board bytes
(/root/reference/MCTS.py:39-47,125-126).  On TPU that becomes a preallocated
node arena per tree with a static node dimension: ``num_sims`` simulations
expand at most ``num_sims`` nodes.

Design driver (measured on the target TPU): batched gathers/scatters lower to
full passes over their operand, so cost ≈ number-of-big-array passes, almost
independent of how few items are touched.  The per-simulation pipeline is
therefore organized around a fixed, depth-independent number of dense passes:

1. ``dense_best_action``: ONE fused pass over (B, N, A) computes the PUCT
   argmax for EVERY node (exact — node statistics are frozen during a single
   descent, so precomputing all decisions equals walking them sequentially).
2. ``walk_path``: the root-to-leaf walk then touches only tiny (B, N) pointer
   maps (~µs per level), recording a dense on-path mask and swap prefix sums.
3. ``expand_batch``: one prior-row pass + small scalar writes.  nsa/qsa/
   n_visit rows never need initialization (arenas are pre-zeroed and nodes
   are written once), and valids are encoded in the prior sign (invalid = -1)
   so no separate valid array exists.
4. ``backup_dense``: ONE blended read-modify-write pass over (B, N, A)
   updates every on-path edge simultaneously (the reference's leaf-to-root
   recursion unwind, MCTS.py:175-183, applied as a mask).

Divergence from the reference (documented, see SURVEY.md §7 "hard parts"):
nodes are tree-shaped, not a transposition table — two paths reaching the
same state create two nodes.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from alphazero_tpu.games.base import GameSpec

# Reference constants (/root/reference/MCTS.py:10-14).
EPS = 1e-8
FORCED_K = 0.5


@struct.dataclass
class Tree:
    """B search trees in lockstep (leading batch dim on every array).

    Node 0 is the root.  ``children[b, n, a] == -1`` means edge (n, a) is
    unexpanded.  ``prior`` doubles as the valid mask: invalid actions hold
    the sentinel -1 (any negative), valid ones the NN prior (>= 0).  Value
    vectors are per-player in each node's own canonical frame (index 0 =
    player to move at that node).
    """

    states: jax.Array     # (B, N, *state_shape) int8
    prior: jax.Array      # (B, N, A) prior_dtype; invalid = -1
    nsa: jax.Array        # (B, N, A) count_dtype
    qsa: jax.Array        # (B, N, A) q_dtype
    children: jax.Array   # (B, N, A) child_dtype; -1 = unexpanded,
    #                       >= 0 = interior child n, <= -2 = TERMINAL child
    #                       -(2+n) (encoded at expand time so the walk needs
    #                       no separate is_term lookup)
    qs: jax.Array         # (B, N) q_dtype — running node value
    n_visit: jax.Array    # (B, N) count_dtype — Ns
    swap: jax.Array       # (B, N) int8 — player shift parent -> node
    is_term: jax.Array    # (B, N) bool
    term_val: jax.Array   # (B, N, P) float32 — terminal result vectors
    parent: jax.Array     # (B, N) int32 — used only for cross-move subtree
    #                       extraction (extract_subtree); search never reads it
    next_free: jax.Array  # (B,) int32


def count_dtype_for(num_sims: int):
    """Smallest count dtype: visit counts are bounded by the sim budget."""
    return jnp.uint8 if num_sims < 255 else jnp.int32


def child_dtype_for(num_nodes: int):
    """Smallest child-index dtype (signed; must also hold the terminal
    encoding -(2 + num_nodes))."""
    if num_nodes <= 125:
        return jnp.int8
    if num_nodes <= 32765:
        return jnp.int16
    return jnp.int32


def make_tree(spec: GameSpec, batch: int, num_nodes: int,
              q_dtype=jnp.float32, prior_dtype=jnp.float32,
              dtype_nodes: int = 0) -> Tree:
    """dtype_nodes: pick count/child dtypes as if the arena had this many
    nodes (staged arena growth pads a small arena up to a final width, so
    every stage must share the final width's dtypes)."""
    B, N, A, P = batch, num_nodes, spec.num_actions, spec.num_players
    cdt = count_dtype_for(dtype_nodes or num_nodes)
    kdt = child_dtype_for(dtype_nodes or num_nodes)
    return Tree(
        states=jnp.zeros((B, N, *spec.state_shape), jnp.int8),
        prior=jnp.full((B, N, A), -1, prior_dtype),
        nsa=jnp.zeros((B, N, A), cdt),
        qsa=jnp.zeros((B, N, A), q_dtype),
        children=jnp.full((B, N, A), -1, kdt),
        qs=jnp.zeros((B, N), q_dtype),
        n_visit=jnp.zeros((B, N), cdt),
        swap=jnp.zeros((B, N), jnp.int8),
        is_term=jnp.zeros((B, N), bool),
        term_val=jnp.zeros((B, N, P), jnp.float32),
        parent=jnp.zeros((B, N), jnp.int32),
        next_free=jnp.ones((B,), jnp.int32),
    )


def grow_tree(tree: Tree, num_nodes_new: int) -> Tree:
    """Pad every node-indexed array up to ``num_nodes_new`` slots (staged
    arena growth: per-sim pass cost scales with arena width, and sim s only
    needs s+1 slots).  Pure padding with each array's empty-slot sentinel —
    bit-exact with running the whole search at the final width."""
    dn = num_nodes_new - tree.prior.shape[1]
    if dn <= 0:
        return tree

    def pad(arr, fill):
        widths = [(0, 0)] * arr.ndim
        widths[1] = (0, dn)
        return jnp.pad(arr, widths, constant_values=fill)

    return Tree(
        states=pad(tree.states, 0),
        prior=pad(tree.prior, -1),
        nsa=pad(tree.nsa, 0),
        qsa=pad(tree.qsa, 0),
        children=pad(tree.children, -1),
        qs=pad(tree.qs, 0),
        n_visit=pad(tree.n_visit, 0),
        swap=pad(tree.swap, 0),
        is_term=pad(tree.is_term, False),
        term_val=pad(tree.term_val, 0.0),
        parent=pad(tree.parent, 0),
        next_free=tree.next_free,
    )


def init_root(tree: Tree, states, valids, prior, value0) -> Tree:
    """Install root nodes (the reference's first search() call — the
    Ps-is-None expansion branch, /root/reference/MCTS.py:140-154)."""
    pr = jnp.where(valids, prior.astype(tree.prior.dtype),
                   jnp.asarray(-1, tree.prior.dtype))
    return tree.replace(
        states=tree.states.at[:, 0].set(states),
        prior=tree.prior.at[:, 0].set(pr),
        qs=tree.qs.at[:, 0].set(value0.astype(tree.qs.dtype)),
    )


def dense_best_action(tree: Tree, cpuct: float, fpu: float, forced_root,
                      sim_idx) -> jax.Array:
    """PUCT action selection for ALL nodes in one fused pass — the reference
    pick_highest_UCB (/root/reference/MCTS.py:210-230) vectorized over the
    whole arena.  Exact: during one descent no statistic changes, so the
    per-node argmax equals what a sequential walk would pick at each level.

    forced_root: (B,) bool — forced playouts, applied at the root row only
    (the reference recurses with forced_playouts=False, MCTS.py:175).
    Returns (best, code), both (B, N) int32: code is the children entry
    along best (the next-node code walk_path follows).  Selecting it here —
    in the same traversal as the PUCT argmax — lets XLA fuse the children
    read with the prior/nsa/qsa pass instead of paying a separate
    (B, N, A) pass at walk time.  The select is a masked reduce, NOT
    take_along_axis: a minor-dim gather lowers to ~13 GB/s on this chip
    while the equivalent where+sum runs at elementwise speed (measured 5x
    on the fused pass, scripts/platform_probe4.py).
    """
    qdt = tree.qs.dtype
    valid = tree.prior >= 0
    P = jnp.where(valid, tree.prior, 0).astype(qdt)
    Nsa = tree.nsa.astype(qdt)
    Ns = tree.n_visit.astype(qdt)[..., None]
    Qs = tree.qs[..., None]

    if fpu > 0:          # parent-relative FPU (static config branch)
        fpu_init = Qs - qdt.type(fpu)
    else:                # absolute FPU
        fpu_init = jnp.full_like(Qs, qdt.type(fpu))

    u_unvis = fpu_init + cpuct * P * jnp.sqrt(Ns + EPS)
    u_vis = tree.qsa + cpuct * P * jnp.sqrt(Ns) / (1 + Nsa)
    u = jnp.where(tree.nsa > 0, u_vis, u_unvis)
    u = jnp.where(valid, u, -jnp.inf)
    best = jnp.argmax(u, axis=-1).astype(jnp.int32)          # (B, N)

    # forced playout at the root: first valid action with
    # Nsa < floor(sqrt(k * P * sim_idx))
    p0 = P[:, 0]
    thr = jnp.floor(jnp.sqrt(FORCED_K * p0 * sim_idx.astype(qdt)))
    fmask = valid[:, 0] & (Nsa[:, 0] < thr) & forced_root[:, None]
    root_forced = jnp.argmax(fmask, axis=-1).astype(jnp.int32)
    root_best = jnp.where(jnp.any(fmask, axis=-1), root_forced, best[:, 0])
    best = best.at[:, 0].set(root_best)
    iota_a = jax.lax.broadcasted_iota(jnp.int32, tree.children.shape, 2)
    sel = iota_a == best[..., None]
    code = jnp.sum(jnp.where(sel, tree.children.astype(jnp.int32), 0),
                   axis=-1, dtype=jnp.int32)
    return best, code


class WalkOut(NamedTuple):
    parent: jax.Array      # (B,) int32 — node whose edge was selected
    action: jax.Array      # (B,) int32
    existing: jax.Array    # (B,) int32 — >=0 iff walk stopped on an existing
    #                        (terminal or depth-capped) child
    depth: jax.Array       # (B,) int32 — number of edges on the path
    onpath: jax.Array      # (B, N) bool — nodes on the root-to-parent path
    scum: jax.Array        # (B, N) int32 — swap prefix sum root->node
    #                        (valid where onpath)
    psum: jax.Array        # (B,) int32 — swap prefix sum at parent


def walk_path(tree: Tree, best, code, depth_cap: int = 0) -> WalkOut:
    """Follow the precomputed best actions from the root, on tiny (B, N)
    maps.  Stops at an unexpanded edge, a terminal child, or the depth cap.

    Per-level cost is pass-overhead-bound, so the per-node walk data (best
    action, next-node code, swap) is packed into ONE (B, 3, N) map — N on
    the minor (lane) axis so nothing pads to 128 — read by a masked reduce
    per level (a take_along_axis row gather costs ~10x more on this chip,
    scripts/platform_probe4.py), and the "terminal child" / "unexpanded"
    stop conditions are folded into the next-node code:
        code >= 0   -> interior child `code`
        code == -1  -> unexpanded edge (new leaf)
        code <= -2  -> terminal child (-2 - code)
    The swap-prefix map `scum` doubles as the on-path marker (-1 = off
    path), saving a separate mask blend per level.

    depth_cap > 0 limits descent depth (perf/behavior knob; a cap-stopped
    walk ends on an existing child, whose stored Q is then backed up by
    expand semantics — see expand_batch).
    """
    B, N, A = tree.prior.shape
    cap = depth_cap if depth_cap > 0 else 0x7FFFFFF0
    iota = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)

    # `code` is the children entry along best (terminality encoded, see Tree
    # docstring), selected by dense_best_action in the same traversal as the
    # PUCT argmax so the children read costs no separate (B, N, A) pass
    packed = jnp.stack(
        [best, code, tree.swap.astype(jnp.int32)], axis=1)    # (B, 3, N)

    def row_at(idx):
        sel = iota[:, None, :] == idx[:, None, None]          # (B, 1, N)
        r = jnp.sum(jnp.where(sel, packed, 0), axis=2,
                    dtype=jnp.int32)                              # (B, 3)
        return r[:, 0], r[:, 1], r[:, 2]                      # a, code, swap

    def cond_fn(c):
        cur, a, ch, depth, rs, scum = c
        return jnp.any((ch >= 0) & (depth < cap))

    def body_fn(c):
        cur, a, ch, depth, rs, scum = c
        go = (ch >= 0) & (depth < cap)
        nc = jnp.where(go, jnp.maximum(ch, 0), cur)
        na, ncode, nsw = row_at(nc)
        rs = rs + jnp.where(go, nsw, 0)
        scum = jnp.where(go[:, None] & (iota == nc[:, None]),
                         rs[:, None], scum)
        a = jnp.where(go, na, a)
        ch = jnp.where(go, ncode, ch)
        return (nc, a, ch, depth + go.astype(jnp.int32), rs, scum)

    cur0 = jnp.zeros((B,), jnp.int32)
    a0 = best[:, 0]
    ch0 = code[:, 0]
    scum0 = jnp.full((B, N), -1, jnp.int32).at[:, 0].set(0)
    cur, a, ch, depth, rs, scum = jax.lax.while_loop(
        cond_fn, body_fn,
        (cur0, a0, ch0, jnp.ones((B,), jnp.int32), cur0, scum0))
    # decode the stop condition: ch == -1 -> new leaf; ch <= -2 -> terminal
    # child; ch >= 0 -> depth-cap stop on interior child
    existing = jnp.where(ch == -1, -1, jnp.where(ch <= -2, -2 - ch, ch))
    return WalkOut(parent=cur, action=a, existing=existing, depth=depth,
                   onpath=scum >= 0, scum=jnp.maximum(scum, 0), psum=rs)


def expand_batch(tree: Tree, walk: WalkOut, child_state, child_swap,
                 child_valids, child_prior, child_value, child_term,
                 active) -> Tuple[Tree, jax.Array, jax.Array, jax.Array]:
    """Install new leaf nodes where the selected edge was unexpanded.

    Returns (tree, leaf, v_leaf, leaf_swap): v_leaf is the value vector to
    back up in the leaf's own canonical frame (NN value for new interior
    leaves, terminal vector for terminal leaves, stored-Q expansion for
    depth-capped revisits — reference MCTS.py:130-154), leaf_swap the player
    shift of the leaf relative to its parent.

    nsa/qsa/n_visit rows of new nodes need no writes: arenas are pre-zeroed
    and node slots are written exactly once.
    """
    B = walk.parent.shape[0]
    Np = tree.term_val.shape[2]
    is_new = walk.existing < 0
    child_is_term = jnp.any(child_term != 0, axis=-1)
    new_idx = tree.next_free
    leaf = jnp.where(is_new, new_idx, walk.existing)

    old = jnp.maximum(walk.existing, 0)
    # all reads of row `old` via one masked reduce over N (gathers lower
    # poorly on this chip; exactly one row is selected so the sum IS it)
    N_ = tree.qs.shape[1]
    old_sel = (jax.lax.broadcasted_iota(jnp.int32, (B, N_), 1)
               == old[:, None])                                # (B, N)
    stored_term = jnp.sum(
        jnp.where(old_sel[..., None], tree.term_val, 0.0), axis=1,
        dtype=tree.term_val.dtype)
    # cap-stopped interior revisit: expand the stored scalar Q per player
    q_old = jnp.sum(jnp.where(old_sel, tree.qs.astype(jnp.float32), 0.0),
                    axis=1, dtype=jnp.float32)
    old_is_term = jnp.any(old_sel & tree.is_term, axis=1)
    old_swap = jnp.sum(jnp.where(old_sel, tree.swap, 0), axis=1,
                       dtype=tree.swap.dtype)
    stored_q = jnp.concatenate(
        [q_old[:, None], jnp.tile(-q_old[:, None] / (Np - 1), (1, Np - 1))],
        axis=1)
    stored_v = jnp.where(old_is_term[:, None], stored_term, stored_q)
    v_leaf = jnp.where(is_new[:, None],
                       jnp.where(child_is_term[:, None], child_term,
                                 child_value),
                       stored_v)
    leaf_swap = jnp.where(is_new, child_swap,
                          old_swap.astype(child_swap.dtype))

    N = tree.prior.shape[1]
    wmask = active & is_new & (new_idx < N)   # full-arena guard (tree reuse)
    # Row installs are where-blends, not scatters: a row scatter lowers to a
    # full copy of its operand anyway on this chip, and the blend runs at
    # elementwise speed (~25% faster measured, scripts/platform_probe4.py).
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    row_sel = wmask[:, None] & (iota_n == new_idx[:, None])   # (B, N)

    def row(arr, val):
        v = jnp.expand_dims(jnp.asarray(val, arr.dtype), 1)
        m = row_sel.reshape((B, N) + (1,) * (arr.ndim - 2))
        return jnp.where(m, v, arr)

    iota_a = jax.lax.broadcasted_iota(jnp.int32, tree.children.shape, 2)
    edge_sel = ((wmask[:, None] & (iota_n == walk.parent[:, None]))[..., None]
                & (iota_a == walk.action[:, None, None]))
    code_new = jnp.where(child_is_term, -2 - new_idx,
                         new_idx).astype(tree.children.dtype)

    pr = jnp.where(child_valids, child_prior.astype(tree.prior.dtype),
                   jnp.asarray(-1, tree.prior.dtype))
    tree = tree.replace(
        states=row(tree.states, child_state),
        prior=row(tree.prior, pr),
        qs=row(tree.qs, v_leaf[:, 0]),
        swap=row(tree.swap, child_swap),
        is_term=row(tree.is_term, child_is_term),
        term_val=row(tree.term_val, child_term),
        parent=row(tree.parent, walk.parent),
        children=jnp.where(edge_sel, code_new[:, None, None], tree.children),
        next_free=tree.next_free + wmask.astype(jnp.int32),
    )
    return tree, leaf, v_leaf, leaf_swap


def backup_dense(tree: Tree, walk: WalkOut, best, v_leaf, leaf_swap,
                 active) -> Tree:
    """Back the leaf value up every on-path edge in one blended pass.

    Reference recurrence (MCTS.py:175-183) for the edge out of path node n:
        v0(n) = roll(v_leaf, suffix_swap(n))[0]
        Qsa[n, a] = (Nsa*Qsa + v0) / (Nsa+1) ;  Nsa += 1
        Qs[n]     = ((Ns+1)*Qs + v0) / (Ns+2) ;  Ns  += 1
    where suffix_swap(n) = (psum - scum[n]) + leaf_swap (swap prefix sums
    recorded by walk_path; rolls compose).  The action out of every path
    node IS best[n] (the walk followed best), so the edge mask is dense.
    """
    qdt = tree.qs.dtype
    B, N, A = tree.prior.shape
    Np = v_leaf.shape[1]

    on = walk.onpath & active[:, None]                        # (B, N)
    suffix = (walk.psum[:, None] - walk.scum
              + leaf_swap.astype(jnp.int32)[:, None])         # (B, N)
    # v0 per node: v_leaf rolled by suffix, component 0 => index (-suffix)%P
    # (selected by static comparison over the <=5 player slots — a gather
    # from a (B, P) operand to a (B, N) output lowers poorly here)
    idx = (-suffix) % Np
    vq = v_leaf.astype(qdt)
    v0 = jnp.zeros_like(tree.qs)
    for p in range(Np):
        v0 = jnp.where(idx == p, vq[:, p, None], v0)

    iota_a = jax.lax.broadcasted_iota(jnp.int32, (B, N, A), 2)
    sel = on[..., None] & (iota_a == best[..., None])
    nf = tree.nsa.astype(qdt)
    q_new = (nf * tree.qsa + v0[..., None]) / (nf + 1)
    qsa = jnp.where(sel, q_new, tree.qsa)
    nsa = tree.nsa + sel.astype(tree.nsa.dtype)

    ns = tree.n_visit.astype(qdt)
    qs_new = ((ns + 1) * tree.qs + v0) / (ns + 2)
    qs = jnp.where(on, qs_new, tree.qs)
    n_visit = tree.n_visit + on.astype(tree.n_visit.dtype)

    return tree.replace(qsa=qsa, nsa=nsa, qs=qs, n_visit=n_visit)


def extract_subtree(tree: Tree, action, num_nodes_new: int,
                    max_keep: int = 0) -> Tuple[Tree, jax.Array]:
    """Re-root each lane's tree at the chosen root child — cross-move tree
    reuse (the reference persists its node dict across moves within an
    episode, /root/reference/MCTS.py:85-91,125-126; reset only between
    arena games, Arena.py:99).

    Returns (tree', ok) where tree' has ``num_nodes_new`` slots, the chosen
    child's subtree compacted into slots 0.. with all statistics (Nsa, Qsa,
    priors, terminal encodings) preserved, and ok (B,) marks lanes whose
    reuse is valid: the chosen child exists, is interior (non-terminal), and
    its subtree fits the new arena.  Lanes with ok=False get an empty tree
    and must be root-expanded fresh by the caller.

    Node indices are strictly increasing along any path (children are
    allocated after parents), so subtree membership is a single index-order
    pass and compaction (cumsum ranks) preserves the ordering invariant.
    """
    B, N, A = tree.prior.shape
    Nn = num_nodes_new
    bidx = jnp.arange(B)
    code = tree.children[bidx, 0, action.astype(jnp.int32)].astype(jnp.int32)
    root_new = jnp.maximum(code, 1)
    ok = code >= 1                       # interior child exists

    def body(j, member):
        p = tree.parent[:, j]
        m = (j == root_new) | member[bidx, p]
        return member.at[:, j].set(m)

    member = jax.lax.fori_loop(
        1, N, body, jnp.zeros((B, N), bool))
    sizes = jnp.sum(member, axis=1).astype(jnp.int32)
    # the caller's next search adds up to its sim budget in new nodes, so
    # only subtrees within max_keep (== the arena headroom) are reused
    ok = ok & (sizes <= (max_keep if max_keep > 0 else Nn))
    member = member & ok[:, None]

    rank = jnp.cumsum(member, axis=1).astype(jnp.int32) - 1   # new index
    new_of_old = jnp.where(member, rank, -1)                  # (B, N)
    # inverse permutation: old index per new slot, OOB for empty slots
    old_of_new = jnp.full((B, Nn), N, jnp.int32).at[
        bidx[:, None], jnp.where(member, rank, Nn)
    ].set(jnp.broadcast_to(jnp.arange(N), (B, N)), mode="drop")

    def take(arr, fill):
        idx = old_of_new.reshape((B, Nn) + (1,) * (arr.ndim - 2))
        idx = jnp.broadcast_to(idx, (B, Nn) + arr.shape[2:])
        return jnp.take_along_axis(arr, idx, axis=1, mode="fill",
                                   fill_value=fill).astype(arr.dtype)

    # children codes must be remapped through the compaction
    ch = take(tree.children, -1).astype(jnp.int32)            # old codes
    tgt = jnp.where(ch >= 0, ch, -2 - ch)                     # old child idx
    tgt = jnp.clip(tgt, 0, N - 1)
    # gather new index of each referenced child: new_of_old[b, tgt]
    flat = jnp.take_along_axis(
        new_of_old, tgt.reshape(B, -1), axis=1).reshape(B, Nn, A)
    ch_new = jnp.where(ch == -1, -1,
                       jnp.where(ch >= 0, flat, -2 - flat))
    # a terminal child is not a member (it has no subtree value); its stats
    # live on the edge, so remapping only applies to interior codes — but
    # terminal CHILD NODES are members too (they hang off interior parents),
    # so flat is valid for both encodings.

    parent_new = jnp.take_along_axis(
        new_of_old, jnp.clip(take(tree.parent, 0), 0, N - 1), axis=1)
    parent_new = jnp.maximum(parent_new, 0)

    out = Tree(
        states=take(tree.states, 0),
        prior=take(tree.prior, -1),
        nsa=take(tree.nsa, 0),
        qsa=take(tree.qsa, 0),
        children=ch_new.astype(tree.children.dtype),
        qs=take(tree.qs, 0),
        n_visit=take(tree.n_visit, 0),
        swap=take(tree.swap, 0).at[:, 0].set(0),
        is_term=take(tree.is_term, False),
        term_val=take(tree.term_val, 0.0),
        parent=parent_new.at[:, 0].set(0),
        next_free=jnp.where(ok, sizes, 1),
    )
    return out, ok
